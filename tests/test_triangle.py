"""Triangle mesh tests: watertightness + oracle checks.

Mirrors reference ``tests/tri_watertight.rs`` (random interior rays against
a closed mesh must never leak) and the inline triangle tests
(triangle.rs:440-450 sign behavior).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fountain_tpu.core.vecmath import V3
from fountain_tpu.geometry.triangle import (intersect_triangles,
                                            intersect_triangles_any,
                                            triangle_hit_info,
                                            woop_intersect)


def _v3(a):
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])
from fountain_tpu.io.ply import load_ply
from fountain_tpu.scene.build import SceneBuilder

DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "rounded_cube.ply")


def _unit_tri_table():
    b = SceneBuilder()
    m = b.add_matte()
    b.add_triangle_mesh(
        positions=[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        indices=[[0, 1, 2]], mat_id=m)
    return b.build().triangles


class TestWoop:
    def test_simple_hit(self):
        tris = _unit_tri_table()
        o = jnp.asarray([[0.25, 0.25, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        t, idx, ok = intersect_triangles(tris, o, d, jnp.asarray([jnp.inf]))
        assert bool(ok[0])
        np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
        hit = triangle_hit_info(tris, idx, _v3(o), _v3(d), t, ok)
        np.testing.assert_allclose(np.asarray(hit.p.stack()[0]),
                                   [0.25, 0.25, 0.0], atol=1e-6)
        # geometric normal perpendicular to the triangle
        assert abs(abs(float(hit.n.z[0])) - 1.0) < 1e-5

    def test_miss_outside(self):
        tris = _unit_tri_table()
        o = jnp.asarray([[0.9, 0.9, 1.0]], jnp.float32)  # outside hypotenuse
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        _, _, ok = intersect_triangles(tris, o, d, jnp.asarray([jnp.inf]))
        assert not bool(ok[0])

    def test_t_max_respected(self):
        tris = _unit_tri_table()
        o = jnp.asarray([[0.25, 0.25, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        _, _, ok = intersect_triangles(tris, o, d, jnp.asarray([0.5]))
        assert not bool(ok[0])
        assert not bool(intersect_triangles_any(tris, o, d,
                                                jnp.asarray([0.5]))[0])

    def test_oracle_vs_moller(self):
        # brute-force oracle: classic Möller-Trumbore in float64 numpy
        rs = np.random.RandomState(0)
        p0 = rs.randn(200, 3)
        p1 = rs.randn(200, 3)
        p2 = rs.randn(200, 3)
        o = rs.randn(200, 3) * 2
        d = rs.randn(200, 3)
        t, b0, b1, b2, ok = woop_intersect(
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(p2, jnp.float32), jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32), jnp.full((200,), np.inf, jnp.float32))
        # float64 oracle
        e1 = p1 - p0
        e2 = p2 - p0
        h = np.cross(d, e2)
        a = np.einsum("ij,ij->i", e1, h)
        parallel = np.abs(a) < 1e-12
        f = 1.0 / np.where(parallel, 1.0, a)
        s = o - p0
        u = f * np.einsum("ij,ij->i", s, h)
        q = np.cross(s, e1)
        v = f * np.einsum("ij,ij->i", d, q)
        t_ref = f * np.einsum("ij,ij->i", e2, q)
        ok_ref = (~parallel & (u >= 0) & (v >= 0) & (u + v <= 1)
                  & (t_ref > 1e-7))
        ok = np.asarray(ok)
        # agreement away from boundary edge cases
        boundary = (np.abs(u) < 1e-4) | (np.abs(v) < 1e-4) \
            | (np.abs(1 - u - v) < 1e-4)
        agree = (ok == ok_ref) | boundary
        assert agree.mean() > 0.995, f"disagree {np.where(~agree)[0][:10]}"
        both = ok & ok_ref
        np.testing.assert_allclose(np.asarray(t)[both], t_ref[both],
                                   rtol=1e-3)


@pytest.mark.slow
def test_watertight_rounded_cube():
    """Reference tri_watertight.rs:25-37: rays from inside a closed mesh
    must all hit (no leaks). Reduced ray count on CPU; the TPU bench runs
    the full 100k."""
    mesh = load_ply(DATA)
    assert mesh.positions.shape[0] == 8664
    assert mesh.indices.shape[0] == 4332
    b = SceneBuilder()
    m = b.add_matte()
    b.add_triangle_mesh(mesh.positions, mesh.indices, normals=mesh.normals,
                        mat_id=m)
    tris = b.build().triangles

    n = 5000
    rs = np.random.RandomState(42)
    z = rs.uniform(-1, 1, n)
    phi = rs.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z * z)
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    o = np.zeros((n, 3), np.float32)  # mesh is centered at origin

    hit = intersect_triangles_any(tris, jnp.asarray(o), jnp.asarray(d),
                                  jnp.full((n,), np.inf, jnp.float32))
    leaks = int(n - np.asarray(hit).sum())
    assert leaks == 0, f"{leaks} leaked rays of {n}"


def test_packed_attr_hit_info_matches_unpacked():
    """build_tri_attr row-gather path == classic multi-gather path."""
    import jax.numpy as jnp
    from fountain_tpu.geometry.bvh import attach_bvh
    from fountain_tpu.geometry.triangle import (build_tri_attr,
                                                intersect_triangles,
                                                triangle_hit_info)
    from fountain_tpu.io.ply import load_ply
    from fountain_tpu.scene.build import SceneBuilder

    mesh = load_ply(DATA)
    b = SceneBuilder()
    m = b.add_matte()
    b.add_triangle_mesh(mesh.positions, mesh.indices, normals=mesh.normals,
                        mat_id=m)
    scene = attach_bvh(b.build())
    tris = scene.triangles
    assert scene.tri_attr is not None

    rng = np.random.default_rng(7)
    n = 512
    o = jnp.asarray(rng.normal(0, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t, idx, ok = intersect_triangles(tris, o, d,
                                     jnp.full((n,), jnp.inf, jnp.float32))
    assert int(ok.sum()) > 50
    h0 = triangle_hit_info(tris, idx, _v3(o), _v3(d), t, ok)
    h1 = triangle_hit_info(tris, idx, _v3(o), _v3(d), t, ok,
                           attr=scene.tri_attr)
    import jax
    paths0, _ = jax.tree.flatten_with_path(h0)
    paths1, _ = jax.tree.flatten_with_path(h1)
    for (k0, a), (k1, b_) in zip(paths0, paths1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-6, err_msg=str(k0))
