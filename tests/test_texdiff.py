"""Texture-differential validation: the ray-cone mip width vs the
reference's plane-projection differentials.

The reference computes per-hit uv footprints by intersecting the camera's
auxiliary rays (rx, ry) with the tangent plane and solving a 2x2 system
(src/interaction.rs:123-173); the MIPMap then filters with
width = max(|dudx|, |dvdx|, |dudy|, |dvdy|).

This framework replaces that with an ELONGATED ray cone:
tex_width = (cone_width + t * spread) * inv_uv_scale / max(|cos θ|, 0.05),
with spread = max(|rx_d - d|, |ry_d - d|), inv_uv_scale =
max(1/|dpdu|, 1/|dpdv|) (integrator/path.py bounce body,
geometry/triangle.py inv_uv), and θ the incidence angle. The 1/cos
stretch reproduces the plane projection's grazing elongation, so the
cone width matches the reference's max-axis width
max(|dudx|, |dvdx|, |dudy|, |dvdy|) within one mip level at BOTH normal
and grazing incidence (validated below).
"""
import numpy as np
import jax.numpy as jnp

from fountain_tpu.core import transform as tf
from fountain_tpu.core.vecmath import V3, dot, length
from fountain_tpu.geometry.intersect import scene_intersect
from fountain_tpu.scene.build import SceneBuilder
from fountain_tpu.scene.camera import generate_rays, make_perspective_camera


def _plane_scene():
    """Unit textured quad in z=0, uv = world xy."""
    p = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b = SceneBuilder()
    mat = b.add_matte(kd=[0.5] * 3)
    b.add_triangle_mesh(p, f, uv=uv, mat_id=mat)
    return b.build()


def _footprints(eye, target, res=16):
    scene = _plane_scene()
    cam = make_perspective_camera(
        tf.look_at(eye, target, [0.0, 1.0, 0.0]), (res, res), fov_deg=30.0)
    n = res * res
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32) + 0.5
    py = (lane // res).astype(jnp.float32) + 0.5
    rays = generate_rays(cam, px, py, jnp.zeros(n), jnp.zeros(n))
    hit = scene_intersect(scene, rays.o, rays.d, jnp.full((n,), jnp.inf))

    # --- cone width (what the integrator computes in the bounce body:
    # elongated by 1/|cos theta| at the hit)
    spread = jnp.maximum(length((rays.rx_d - rays.d).stack()),
                         length((rays.ry_d - rays.d).stack()))
    abs_cos = jnp.abs(dot(hit.wo, hit.n))
    w_cone = hit.t * spread * hit.inv_uv_scale / jnp.maximum(abs_cos, 0.05)

    # --- reference plane projection (interaction.rs:123-173): intersect
    # rx/ry with the tangent plane, uv offsets via the known uv = (x, y)
    # parameterization of this quad (dpdu = x-axis, dpdv = y-axis)
    def plane_uv(o, d):
        nz = V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
        t = (dot(nz, hit.p) - dot(nz, o)) / dot(nz, d)
        ph = o + d * t
        return ph.x, ph.y      # uv == world xy on this quad

    ux, vx = plane_uv(rays.rx_o, rays.rx_d)
    uy, vy = plane_uv(rays.ry_o, rays.ry_d)
    dudx = ux - hit.u
    dvdx = vx - hit.v
    dudy = uy - hit.u
    dvdy = vy - hit.v
    w_ref = jnp.maximum(jnp.maximum(jnp.abs(dudx), jnp.abs(dvdx)),
                        jnp.maximum(jnp.abs(dudy), jnp.abs(dvdy)))
    ok = np.asarray(hit.valid)
    return np.asarray(w_cone)[ok], np.asarray(w_ref)[ok], hit


def test_cone_matches_plane_projection_normal_incidence():
    w_cone, w_ref, _ = _footprints([0.5, 0.5, 2.0], [0.5, 0.5, 0.0])
    assert len(w_ref) > 100
    ratio = w_cone / w_ref
    # same mip level +-1: ratio within [0.5, 2]
    assert 0.5 < float(np.median(ratio)) < 2.0, float(np.median(ratio))
    assert float(ratio.min()) > 0.3 and float(ratio.max()) < 3.0


def test_cone_matches_plane_projection_at_grazing():
    # ~75 degrees off-normal: the 1/cos-elongated cone must match the
    # reference's max-axis plane-projection width within ONE MIP LEVEL
    # (the round-5 upgrade; the old isotropic cone under-estimated by
    # ~cos(theta) here)
    w_cone, w_ref, hit = _footprints([0.5, -3.0, 1.0], [0.5, 0.5, 0.0],
                                     res=48)
    assert len(w_ref) > 50
    ratio = w_cone / w_ref
    med = float(np.median(ratio))
    assert 0.5 < med < 2.0, med
    assert float(ratio.min()) > 0.3 and float(ratio.max()) < 3.0
