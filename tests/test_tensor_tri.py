"""Tensor (MXU matmul) Möller–Trumbore vs the watertight Woop oracle."""
import numpy as np
import jax.numpy as jnp

from fountain_tpu.geometry.tensor_tri import build_tri_features, mt_intersect
from fountain_tpu.geometry.triangle import intersect_triangles
from fountain_tpu.io.ply import load_ply
from fountain_tpu.scene.types import Triangles, empty_triangles


def _random_mesh(n_tris, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    return np.stack([v0, v1, v2], axis=1)


def _tris_from_verts(tv):
    f = len(tv)
    pos = tv.reshape(-1, 3)
    idx = np.arange(3 * f, dtype=np.int32).reshape(f, 3)
    e = empty_triangles()
    return e._replace(
        positions=jnp.asarray(pos), indices=jnp.asarray(idx),
        normals=jnp.zeros_like(jnp.asarray(pos)),
        has_normals=jnp.zeros((f,), bool),
        uv=jnp.zeros((3 * f, 2), jnp.float32),
        mat_id=jnp.zeros((f,), jnp.int32),
        light_id=jnp.zeros((f,), jnp.int32) - 1,
        flip_normal=jnp.zeros((f,), bool),
        mesh_id=jnp.zeros((f,), jnp.int32))


def test_mt_matches_woop_oracle():
    tv = _random_mesh(500, seed=1)
    feat = build_tri_features(tv)
    tris = _tris_from_verts(tv)
    rng = np.random.default_rng(2)
    n = 2000
    o = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((n,), jnp.inf)

    t_mt, i_mt, ok_mt = mt_intersect(feat, o, d, t_max, chunk=128)
    t_w, i_w, ok_w = intersect_triangles(tris, o, d, t_max)

    ok_mt = np.asarray(ok_mt)
    ok_w = np.asarray(ok_w)
    t_mt = np.asarray(t_mt)
    t_w = np.asarray(t_w)
    # hit/miss agreement except a tiny epsilon-edge fringe
    disagree = (ok_mt != ok_w).mean()
    assert disagree < 2e-3, f"hit disagreement {disagree}"
    both = ok_mt & ok_w
    np.testing.assert_allclose(t_mt[both], t_w[both], rtol=2e-3, atol=1e-4)


def test_mt_watertight_rounded_cube():
    """Reference tri_watertight.rs:25-37 through the tensor path: rays from
    inside the closed PLY mesh must ALL hit (the REL_EPS edge expansion is
    what guarantees this for plain-f32 MT)."""
    mesh = load_ply("data/rounded_cube.ply")
    tv = mesh.positions[mesh.indices]
    feat = build_tri_features(tv)
    n = 100_000
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    leaks = 0
    for s in range(0, n, 25_000):  # ray batches keep CPU memory/time sane
        db = jnp.asarray(d[s:s + 25_000])
        o = jnp.zeros((len(db), 3), jnp.float32)
        _, _, ok = mt_intersect(feat, o, db,
                                jnp.full((len(db),), jnp.inf))
        leaks += int((~np.asarray(ok)).sum())
    assert leaks == 0, f"{leaks} leaked rays / {n}"


def test_mt_any_hit_matches_closest():
    tv = _random_mesh(200, seed=5)
    feat = build_tri_features(tv)
    rng = np.random.default_rng(6)
    n = 1000
    o = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    t_max = jnp.full((n,), jnp.inf)
    _, _, ok = mt_intersect(feat, o, d, t_max)
    _, _, blocked = mt_intersect(feat, o, d, t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(blocked))


def test_mt_respects_t_max():
    tv = _random_mesh(100, seed=7)
    feat = build_tri_features(tv)
    o = jnp.asarray([[-20.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t_full, _, ok_full = mt_intersect(feat, o, d, jnp.asarray([jnp.inf]))
    if bool(ok_full[0]):
        # capping below the hit distance must yield a miss
        _, _, ok_cap = mt_intersect(feat, o, d, t_full * 0.5)
        assert not bool(ok_cap[0])
    # negative t_max disables the lane entirely
    _, _, ok_neg = mt_intersect(feat, o, d, jnp.asarray([-1.0]))
    assert not bool(ok_neg[0])
