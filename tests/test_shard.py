"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(the distributed "fake backend" — SURVEY.md §4 implication (d)).

Invariance contract: the counter-based RNG keys off the GLOBAL lane id and
the film splat order is identical, so the sharded image is *sampling-exact*
across device counts — the same random sequences, the same summation order.
XLA may still contract a*b+c into FMA differently when it compiles the body
for different per-shard batch shapes, which perturbs individual lanes by
1 ulp; the tests therefore allow <= 2 ulp (rtol 5e-7), not bitwise zero.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fountain_tpu.core import transform as tf
from fountain_tpu.integrator.path import PathConfig
from fountain_tpu.integrator.render import render
from fountain_tpu.parallel.shard import render_sharded
from fountain_tpu.scene.build import SceneBuilder
from fountain_tpu.scene.camera import make_perspective_camera


def _furnace():
    b = SceneBuilder()
    mat = b.add_matte(kd=[0.5] * 3)
    sph = b.add_sphere(radius=100.0, mat_id=mat, reverse_orientation=True)
    b.add_area_light_sphere(sph, [1.0] * 3)
    cam = make_perspective_camera(
        tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (16, 16), fov_deg=60.0)
    return b.build(), cam


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    scene, cam = _furnace()
    cfg = PathConfig(max_depth=5, rr_threshold=0.0, nee=True)
    ref = np.asarray(render(scene, cam, 16, 16, 8, cfg))
    img8 = np.asarray(render_sharded(scene, cam, 16, 16, 8, cfg,
                                     n_devices=8))
    # lane-keyed RNG + box filter -> sampling-exact across device counts
    # (<= 2 ulp: shape-dependent XLA FMA contraction, see module docstring)
    np.testing.assert_allclose(img8, ref, rtol=5e-7, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_device_count_invariance():
    scene, cam = _furnace()
    cfg = PathConfig(max_depth=3, rr_threshold=0.0, nee=True)
    img2 = np.asarray(render_sharded(scene, cam, 16, 16, 4, cfg, n_devices=2))
    img4 = np.asarray(render_sharded(scene, cam, 16, 16, 4, cfg, n_devices=4))
    np.testing.assert_allclose(img2, img4, rtol=5e-7, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_non_divisible_resolution():
    # 10x10 = 100 lanes over 8 devices: padding lanes must not corrupt film
    scene, cam = _furnace()
    cfg = PathConfig(max_depth=2, rr_threshold=0.0, nee=True)
    ref = np.asarray(render(scene, cam, 10, 10, 4, cfg))
    img = np.asarray(render_sharded(scene, cam, 10, 10, 4, cfg, n_devices=8))
    np.testing.assert_allclose(img, ref, rtol=5e-7, atol=1e-7)
