"""Flash-intersect Pallas kernel (interpret mode) vs the XLA tensor path.

The fused kernel (geometry/pallas_tri.py) is the TPU render path for
dense scenes; on CPU it runs through the Pallas interpreter, which checks
the kernel logic (block cull, reduction argmin, watertight epsilons)
without TPU hardware. Small sizes only — the interpreter is slow.
"""
import numpy as np
import jax.numpy as jnp

from fountain_tpu.core.vecmath import V3
from fountain_tpu.geometry.pallas_tri import (BC, BN, mt_intersect_pallas,
                                              pack_features_pallas)


def _v3(a):
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])
from fountain_tpu.geometry.tensor_tri import build_tri_features, mt_intersect


def _random_mesh(n_tris, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    return np.stack([v0, v1, v2], axis=1)


def _random_rays(n, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_tensor_path():
    # > BC faces so the fori_loop runs multiple blocks; Morton-sorted rays
    # exercise the sort/unsort permutation round-trip
    tv = _random_mesh(BC + 37, seed=3)
    qdata = pack_features_pallas(tv)
    feat = build_tri_features(tv)
    n = BN + 61  # force ray padding too
    o, d = _random_rays(n, seed=4)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)

    t0, i0, ok0 = mt_intersect(feat, o, d, t_max)
    t1, i1, ok1 = mt_intersect_pallas(qdata, _v3(o), _v3(d), t_max,
                                      interpret=True)
    ok0, ok1, t0, t1, i0, i1 = map(np.asarray, (ok0, ok1, t0, t1, i0, i1))
    assert ok0.sum() > 20  # sanity: the scene is actually hit
    np.testing.assert_array_equal(ok0, ok1)
    m = ok0
    np.testing.assert_allclose(t0[m], t1[m], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(i0[m], i1[m])


def test_pallas_any_hit_and_t_cap():
    tv = _random_mesh(200, seed=5)
    qdata = pack_features_pallas(tv)
    feat = build_tri_features(tv)
    o, d = _random_rays(BN, seed=6)
    # finite caps cut off some hits; both paths must agree
    t_max = jnp.full((BN,), 8.0, jnp.float32)
    _, _, ok0 = mt_intersect(feat, o, d, t_max, any_hit=True)
    _, _, ok1 = mt_intersect_pallas(qdata, _v3(o), _v3(d), t_max,
                                    any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))


def test_pallas_multi_superblock():
    """F > SB (1024): the superblock walk crosses superblock boundaries
    and the face-index offset c*BC + j must stay consistent."""
    from fountain_tpu.geometry.pallas_tri import SB
    tv = _random_mesh(SB + 3 * BC + 17, seed=7)
    qdata = pack_features_pallas(tv)
    feat = build_tri_features(tv)
    n = BN
    o, d = _random_rays(n, seed=8)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    t0, i0, ok0 = mt_intersect(feat, o, d, t_max)
    t1, i1, ok1 = mt_intersect_pallas(qdata, _v3(o), _v3(d), t_max,
                                      interpret=True)
    ok0, ok1, t0, t1, i0, i1 = map(np.asarray, (ok0, ok1, t0, t1, i0, i1))
    assert ok0.sum() > 50
    np.testing.assert_array_equal(ok0, ok1)
    m = ok0
    # bf16x6 vs f32 tensor path: backend-noise tolerance (~1e-5 rel)
    np.testing.assert_allclose(t0[m], t1[m], rtol=3e-5, atol=1e-5)
    np.testing.assert_array_equal(i0[m], i1[m])


def test_pallas_multi_chunk():
    """F > CHUNK (8192): multiple outer grid steps (s_blocks > 1) — the
    quantity-interleave chunk reshape, the cross-chunk face-index offset
    s*ch + c*BC + j, and the XLA cross-chunk argmin all engage."""
    from fountain_tpu.geometry.pallas_tri import CHUNK
    tv = _random_mesh(CHUNK + 2 * BC + 5, seed=9, spread=14.0)
    qdata = pack_features_pallas(tv)
    assert qdata[0].shape[0] == 2  # two resident chunks
    feat = build_tri_features(tv)
    n = BN
    o, d = _random_rays(n, seed=10, spread=16.0)
    t_max = jnp.full((n,), jnp.inf, jnp.float32)
    t0, i0, ok0 = mt_intersect(feat, o, d, t_max)
    t1, i1, ok1 = mt_intersect_pallas(qdata, _v3(o), _v3(d), t_max,
                                      interpret=True)
    ok0, ok1, t0, t1, i0, i1 = map(np.asarray, (ok0, ok1, t0, t1, i0, i1))
    assert ok0.sum() > 100
    np.testing.assert_array_equal(ok0, ok1)
    m = ok0
    np.testing.assert_allclose(t0[m], t1[m], rtol=3e-5, atol=1e-5)
    np.testing.assert_array_equal(i0[m], i1[m])
