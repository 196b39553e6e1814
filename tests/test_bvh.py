"""LBVH tests: oracle vs brute force (mirrors reference bvh.rs:401-458)
and watertightness through the BVH path."""
import os

import jax.numpy as jnp
import numpy as np

from fountain_tpu.geometry.bvh import attach_bvh, bvh_intersect, build_lbvh
from fountain_tpu.geometry.triangle import intersect_triangles
from fountain_tpu.io.ply import load_ply
from fountain_tpu.scene.build import SceneBuilder

DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "rounded_cube.ply")


def _random_tri_scene(n_tris=137, seed=0):
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_tris, 3) * 4
    verts = centers[:, None, :] + rs.randn(n_tris, 3, 3)
    positions = verts.reshape(-1, 3).astype(np.float32)
    indices = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    b = SceneBuilder()
    m = b.add_matte()
    b.add_triangle_mesh(positions, indices, mat_id=m)
    return b.build()


def test_lbvh_structure():
    scene = _random_tri_scene(50)
    pos = np.asarray(scene.triangles.positions)
    idx = np.asarray(scene.triangles.indices)
    v = pos[idx]
    nodes_min, nodes_max, meta, order = build_lbvh(v.min(1), v.max(1))
    m = len(meta)
    # root covers everything; miss links strictly increase past each node
    assert meta[0, 0] == m
    assert np.all(meta[:, 0] > np.arange(m))
    assert np.all(meta[:, 0] <= m)
    # leaf prim ranges partition [0, F)
    leaves = meta[meta[:, 2] > 0]
    covered = np.concatenate([np.arange(f, f + c) for _, f, c in
                              leaves[:, [0, 1, 2]]])
    assert sorted(covered.tolist()) == list(range(50))
    # node bounds contain their prims
    assert np.all(nodes_min[0] <= v.min((0, 1)) + 1e-6)
    assert np.all(nodes_max[0] >= v.max((0, 1)) - 1e-6)


def test_bvh_oracle_vs_brute_force():
    # mirrors reference bvh.rs:401-458: BVH result == brute-force list
    scene = _random_tri_scene(137, seed=1)
    scene_b = attach_bvh(scene)
    rs = np.random.RandomState(2)
    n = 500
    o = jnp.asarray(rs.randn(n, 3) * 6, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    t_max = jnp.full((n,), np.inf, jnp.float32)

    t_ref, _, ok_ref = intersect_triangles(scene.triangles, o, d, t_max)
    t_bvh, _, ok_bvh = bvh_intersect(
        scene_b.triangles, scene_b.bvh_nodes_min, scene_b.bvh_nodes_max,
        scene_b.bvh_meta, o, d, t_max)

    ok_ref = np.asarray(ok_ref)
    ok_bvh = np.asarray(ok_bvh)
    np.testing.assert_array_equal(ok_bvh, ok_ref)
    both = ok_ref & ok_bvh
    np.testing.assert_allclose(np.asarray(t_bvh)[both],
                               np.asarray(t_ref)[both], rtol=1e-5)


def test_bvh_any_hit_matches():
    scene = attach_bvh(_random_tri_scene(137, seed=3))
    rs = np.random.RandomState(4)
    n = 400
    o = jnp.asarray(rs.randn(n, 3) * 6, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    t_max = jnp.full((n,), np.inf, jnp.float32)
    _, _, closest = bvh_intersect(
        scene.triangles, scene.bvh_nodes_min, scene.bvh_nodes_max,
        scene.bvh_meta, o, d, t_max)
    _, _, anyhit = bvh_intersect(
        scene.triangles, scene.bvh_nodes_min, scene.bvh_nodes_max,
        scene.bvh_meta, o, d, t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(anyhit), np.asarray(closest))


def test_bvh_watertight_rounded_cube():
    mesh = load_ply(DATA)
    b = SceneBuilder()
    m = b.add_matte()
    b.add_triangle_mesh(mesh.positions, mesh.indices, normals=mesh.normals,
                        mat_id=m)
    scene = attach_bvh(b.build())
    n = 5000
    rs = np.random.RandomState(42)
    z = rs.uniform(-1, 1, n)
    phi = rs.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z * z)
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    o = np.zeros((n, 3), np.float32)
    _, _, hit = bvh_intersect(
        scene.triangles, scene.bvh_nodes_min, scene.bvh_nodes_max,
        scene.bvh_meta, jnp.asarray(o), jnp.asarray(d),
        jnp.full((n,), np.inf, jnp.float32), any_hit=True)
    leaks = int(n - np.asarray(hit).sum())
    assert leaks == 0, f"{leaks} leaked rays of {n}"
