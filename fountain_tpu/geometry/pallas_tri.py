"""Pallas TPU kernel: fused Möller–Trumbore sweep (flash-intersect).

The dense tensor path (geometry/tensor_tri.py) is HBM-bound: each face
block materializes an [N, 4C] pair matrix in HBM. This kernel fuses the
matmul, the acceptance epilogue, and the running per-ray (t, index) min
inside VMEM — the pair matrix never leaves the chip (the same fusion
structure as flash attention):

  grid over ray tiles (BN rays); the whole face-feature table
  ([4, 16, F] ≈ 64·F bytes, F ≤ 64k → ≤ 4 MB) stays VMEM-resident;
  per face block: four [BN,16] @ [16,BC] MXU dots → det/u/v/t numerators,
  sign-robust acceptance on the VPU, block argmin folded into carried
  (t_best, idx_best) vectors.

HBM traffic per traversal: rays in (64 B/ray) + features once + two
output vectors — ~1000x less than the unfused path.

Derivation and epsilon policy: see tensor_tri.py (identical math; the
watertight REL_EPS edge expansion is shared via the packed features).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fountain_tpu.core.vecmath import Float, cross
from fountain_tpu.geometry.tensor_tri import REL_EPS, TriFeatures

BN = 512     # rays per grid step
BC = 512     # faces per inner block
_K = 16      # padded ray-feature depth (10 used)


def pack_features_pallas(tri_verts: np.ndarray) -> jnp.ndarray:
    """[4, 16, Fpad] per-quantity feature matrices (det, u, v, t)."""
    tv = np.asarray(tri_verts, np.float64)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    n = np.cross(e1, e2)
    w1 = np.cross(v0, e1)
    w2 = np.cross(v0, e2)
    k = (v0 * n).sum(-1)
    f = len(tv)
    fpad = -(-max(f, 1) // BC) * BC
    q = np.zeros((4, _K, fpad), np.float32)
    q[0, 0:3, :f] = -n.T                  # det   = -d.n
    q[1, 0:3, :f] = w2.T                  # u_num =  d.w2 + (oxd).e2
    q[1, 3:6, :f] = e2.T
    q[2, 0:3, :f] = -w1.T                 # v_num = -d.w1 - (oxd).e1
    q[2, 3:6, :f] = -e1.T
    q[3, 6:9, :f] = n.T                   # t_num =  o.n - k
    q[3, 9, :f] = -k
    # padding faces: det==0 -> never valid
    return jnp.asarray(q)


def pack_block_bounds(tri_verts: np.ndarray) -> jnp.ndarray:
    """Per-face-block AABBs [n_blocks, 8]: (min.xyz, max.xyz, 0, 0).

    Faces arrive in BVH leaf (Morton) order, so contiguous BC-face blocks
    are spatially coherent and their AABBs tight — the kernel skips a
    block's MXU work entirely when no ray in the tile can hit it (the
    tile-level analog of the reference's per-ray BVH early-out,
    bvh.rs:176).
    """
    tv = np.asarray(tri_verts, np.float32)
    f = len(tv)
    n_blocks = -(-max(f, 1) // BC)
    out = np.zeros((n_blocks, 8), np.float32)
    for b in range(n_blocks):
        blk = tv[b * BC:(b + 1) * BC]
        if len(blk) == 0:
            out[b, 0:3] = 1.0
            out[b, 3:6] = -1.0  # empty: min > max, never hit
        else:
            out[b, 0:3] = blk.reshape(-1, 3).min(0)
            out[b, 3:6] = blk.reshape(-1, 3).max(0)
    return jnp.asarray(out)


def _kernel(rf_ref, feat_ref, aabb_ref, tmax_ref, t_ref, idx_ref,
            *, n_blocks: int, t_eps: float):
    rf = rf_ref[...]                      # [BN, 16]
    t_cap = tmax_ref[...]                 # [BN, 1]
    d = rf[:, 0:3]                        # [BN, 3]
    o = rf[:, 6:9]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    def test_block(c, carry):
        t_best, i_best = carry
        blk = feat_ref[:, :, pl.ds(c * BC, BC)]       # [4, 16, BC]
        # HIGHEST: full-f32 accuracy via bf16 multi-pass — the barycentric
        # acceptance epsilons (REL_EPS) are calibrated for f32 rounding,
        # not bf16 (watertightness would break at default precision)
        dot = lambda k: jax.lax.dot_general(
            rf, blk[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        det = dot(0)
        u_num = dot(1)
        v_num = dot(2)
        t_num = dot(3)

        s = jnp.sign(det)
        adet = jnp.abs(det)
        U = u_num * s
        V = v_num * s
        T = t_num * s
        eps = REL_EPS * adet
        valid = (adet > 1e-20) \
            & (U >= -eps) & (V >= -eps) & (U + V <= adet + eps) \
            & (T > t_eps * adet) & (T < t_best * adet)
        t = jnp.where(valid, T / jnp.where(adet == 0.0, 1.0, adet),
                      jnp.float32(3e38))
        # reduction-only block argmin (Mosaic has no row gather): min t,
        # then min column index among entries equal to it
        t_c = jnp.min(t, axis=1, keepdims=True)                  # [BN, 1]
        cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        j = jnp.min(jnp.where(t <= t_c, cols, jnp.int32(1 << 30)),
                    axis=1, keepdims=True)
        better = t_c < t_best
        t_best = jnp.where(better, t_c, t_best)
        i_best = jnp.where(better, c * BC + j, i_best)
        return t_best, i_best

    def body(c, carry):
        # tile-coherent cull: slab-test every ray in the tile against the
        # block AABB; skip the MXU sweep when none can hit (conservative
        # 1e-4 relative expansion on t_far)
        box = aabb_ref[pl.ds(c, 1), :]                # [1, 8]
        t_lo = (box[:, 0:3] - o) * inv_d              # [BN, 3]
        t_hi = (box[:, 3:6] - o) * inv_d
        t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1, keepdims=True)
        t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1,
                        keepdims=True) * 1.0001
        t_best = carry[0]
        can_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)
        return jax.lax.cond(jnp.any(can_hit), test_block,
                            lambda _, cr: cr, c, carry)

    init = (t_cap, jnp.full((rf.shape[0], 1), -1, jnp.int32))
    t_best, i_best = jax.lax.fori_loop(0, n_blocks, body, init)
    t_ref[...] = t_best
    idx_ref[...] = i_best


@functools.partial(jax.jit, static_argnames=("t_eps", "interpret"))
def _sweep(rf, qfeat, qaabb, t_cap, t_eps: float = 1e-4,
           interpret: bool = False):
    n = rf.shape[0]
    n_tiles = n // BN
    n_blocks = qfeat.shape[-1] // BC
    kern = functools.partial(_kernel, n_blocks=n_blocks, t_eps=t_eps)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((BN, _K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole feature table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # block AABBs
            pl.BlockSpec((BN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(rf, qfeat, qaabb, t_cap)


def _morton16(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave the low 5 bits of q[..., 0:3] into a 15-bit Morton code
    (same bit trick as geometry.bvh.morton3, vectorized in jnp)."""
    def expand(v):
        v = (v | (v << 8)) & 0x100F
        v = (v | (v << 4)) & 0x10C3
        v = (v | (v << 2)) & 0x1249
        return v
    return (expand(q[..., 2]) << 2) | (expand(q[..., 1]) << 1) \
        | expand(q[..., 0])


def sort_keys(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Spatial-coherence sort key per ray: Morton(origin cell) in the high
    bits, Morton(direction octant cell) low — rays that start near each
    other and point the same way land in the same kernel tile, so the
    tile-level AABB cull (see _kernel body) actually prunes blocks.
    This is the wavefront analog of the tile decomposition the reference
    gets for free from its scanline tiles (integrator/mod.rs:199)."""
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    qo = jnp.clip(((o - lo) / jnp.maximum(hi - lo, 1e-12)) * 31.0,
                  0.0, 31.0).astype(jnp.int32)
    qd = jnp.clip((d * 0.5 + 0.5) * 31.0, 0.0, 31.0).astype(jnp.int32)
    return (_morton16(qo) << 15) | _morton16(qd)


def mt_intersect_pallas(qdata, o, d, t_max,
                        t_eps: float = 1e-4, any_hit: bool = False,
                        interpret: bool = False, sort: bool = True):
    """Drop-in for tensor_tri.mt_intersect using the fused kernel.

    qdata: (pack_features_pallas [4,16,Fpad], pack_block_bounds
    [n_blocks,8]); o/d [N,3], t_max [N]. With sort=True (default) the
    wavefront is Morton-reordered before the sweep and the results
    scattered back — results are bit-identical either way.
    """
    qfeat, qaabb = qdata
    n = o.shape[0]
    npad = -(-n // BN) * BN
    # (t, idx) carry no gradient path to scene parameters; detach the ray
    # inputs so reverse-mode never tries to differentiate the kernel
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    perm = None
    if sort and n > BN:
        perm = jnp.argsort(sort_keys(o, d))
        o, d, t_max = o[perm], d[perm], t_max[perm]
    oxd = cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), Float)
    rf = jnp.concatenate(
        [d, oxd, o, one, jnp.zeros(o.shape[:-1] + (_K - 10,), Float)],
        axis=-1)
    t_cap = jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3e38))
    if npad != n:
        rf = jnp.pad(rf, ((0, npad - n), (0, 0)))
        t_cap = jnp.pad(t_cap, (0, npad - n), constant_values=-1.0)
    t, idx = _sweep(rf, qfeat, qaabb, t_cap[:, None], t_eps=t_eps,
                    interpret=interpret)
    t = t[:n, 0]
    idx = idx[:n, 0]
    if perm is not None:  # scatter results back to wavefront order
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n))
        t, idx = t[inv], idx[inv]
    found = idx >= 0
    idx = jnp.maximum(idx, 0)
    if any_hit:
        return t, idx, found
    return jnp.where(found, t, jnp.inf), idx, found
