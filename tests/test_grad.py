"""Differentiability: parameter gradients vs finite differences.

BASELINE.json north star: "validate pixel-gradients against finite
differences" on the furnace albedo. With detached sampling (stop_gradient
on all sampled directions / discrete choices) the estimator is a smooth
function of material/emitter parameters for a FIXED random stream, so
central finite differences of the estimator itself must match jax.grad to
first order, and the analytic furnace derivative d(1/(1-ρ))/dρ = 1/(1-ρ)²
anchors the absolute scale.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fountain_tpu.core import transform as tf
from fountain_tpu.integrator.path import PathConfig
from fountain_tpu.integrator.render import render
from fountain_tpu.scene.build import SceneBuilder
from fountain_tpu.scene.camera import make_perspective_camera


def _scene_camera(albedo=0.5, res=8):
    b = SceneBuilder()
    mat = b.add_matte(kd=[albedo] * 3)
    sph = b.add_sphere(radius=100.0, mat_id=mat, reverse_orientation=True)
    b.add_area_light_sphere(sph, [1.0] * 3)
    cam = make_perspective_camera(
        tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (res, res), fov_deg=60.0)
    return b.build(), cam


def _loss_fn(scene, cam, cfg, res):
    def loss(tex_value):
        s = scene._replace(textures=scene.textures._replace(value=tex_value))
        return jnp.mean(render(s, cam, res, res, 16, cfg))
    return loss


def test_albedo_grad_matches_finite_difference():
    res = 8
    scene, cam = _scene_camera(0.5, res)
    cfg = PathConfig(max_depth=8, rr_threshold=0.0, nee=True)
    loss = _loss_fn(scene, cam, cfg, res)
    tv = scene.textures.value

    g = jax.grad(loss)(tv)
    # the matte kd texture is the one the material references
    kd_row = int(np.argmax(np.asarray(tv).sum(-1) > 0.4))
    g_alb = float(np.asarray(g)[kd_row].sum()) / 3.0 * 3.0  # d/drho, rgb tied

    h = 1e-3
    tv_p = tv.at[kd_row].add(h)
    tv_m = tv.at[kd_row].add(-h)
    fd = (float(loss(tv_p)) - float(loss(tv_m))) / (2 * h)
    # jax.grad perturbs each rgb channel independently; the FD above moves
    # all three at once, so compare against the summed row gradient
    g_row = float(np.asarray(g)[kd_row].sum())
    assert np.isfinite(g_row)
    np.testing.assert_allclose(g_row, fd, rtol=5e-3, atol=1e-4)


def test_albedo_grad_near_analytic():
    """Detached-sampling gradient ≈ analytic d(1/(1-ρ))/dρ = 4 at ρ=0.5.

    NOTE: the detached estimator is biased for path-traced multi-bounce
    gradients truncated at max_depth (the ρ^k tail), so compare against the
    depth-truncated series Σ_{k=0..D} d(ρ^k)/dρ."""
    res = 8
    scene, cam = _scene_camera(0.5, res)
    depth = 12
    cfg = PathConfig(max_depth=depth, rr_threshold=0.0, nee=True)
    loss = _loss_fn(scene, cam, cfg, res)
    g = jax.grad(loss)(scene.textures.value)
    g_total = float(np.asarray(g).sum())
    rho = 0.5
    analytic = sum(k * rho ** (k - 1) for k in range(1, depth + 2))
    np.testing.assert_allclose(g_total, analytic, rtol=0.05)


def test_emitter_grad():
    """Gradient w.r.t. the emitter radiance: L = emit/(1-ρ), dL/demit =
    1/(1-ρ) = 2."""
    res = 8
    scene, cam = _scene_camera(0.5, res)
    cfg = PathConfig(max_depth=16, rr_threshold=0.0, nee=True)

    def loss(emit):
        s = scene._replace(lights=scene.lights._replace(
            emit=jnp.full_like(scene.lights.emit, emit)))
        return jnp.mean(render(s, cam, res, res, 8, cfg))

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    np.testing.assert_allclose(g, 2.0, rtol=0.02)
