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


def _kernel(rf_ref, feat_ref, tmax_ref, t_ref, idx_ref,
            *, n_blocks: int, t_eps: float):
    rf = rf_ref[...]                      # [BN, 16]
    t_cap = tmax_ref[...]                 # [BN, 1]

    def body(c, carry):
        t_best, i_best = carry
        blk = feat_ref[:, :, pl.ds(c * BC, BC)]       # [4, 16, BC]
        dot = lambda k: jax.lax.dot_general(
            rf, blk[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
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
        j = jnp.argmin(t, axis=1, keepdims=True)       # [BN, 1]
        t_c = jnp.take_along_axis(t, j, axis=1)
        better = t_c < t_best
        t_best = jnp.where(better, t_c, t_best)
        i_best = jnp.where(better, (c * BC + j).astype(jnp.int32), i_best)
        return t_best, i_best

    init = (t_cap, jnp.full((rf.shape[0], 1), -1, jnp.int32))
    t_best, i_best = jax.lax.fori_loop(0, n_blocks, body, init)
    t_ref[...] = t_best
    idx_ref[...] = i_best


@functools.partial(jax.jit, static_argnames=("t_eps", "interpret"))
def _sweep(rf, qfeat, t_cap, t_eps: float = 1e-4, interpret: bool = False):
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
    )(rf, qfeat, t_cap)


def mt_intersect_pallas(qfeat: jnp.ndarray, o, d, t_max,
                        t_eps: float = 1e-4, any_hit: bool = False,
                        interpret: bool = False):
    """Drop-in for tensor_tri.mt_intersect using the fused kernel.

    qfeat: pack_features_pallas output [4, 16, Fpad]; o/d [N,3], t_max [N].
    """
    n = o.shape[0]
    npad = -(-n // BN) * BN
    oxd = cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), Float)
    rf = jnp.concatenate(
        [d, oxd, o, one, jnp.zeros(o.shape[:-1] + (_K - 10,), Float)],
        axis=-1)
    t_cap = jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3e38))
    if npad != n:
        rf = jnp.pad(rf, ((0, npad - n), (0, 0)))
        t_cap = jnp.pad(t_cap, (0, npad - n), constant_values=-1.0)
    t, idx = _sweep(rf, qfeat, t_cap[:, None], t_eps=t_eps,
                    interpret=interpret)
    t = t[:n, 0]
    idx = idx[:n, 0]
    found = idx >= 0
    idx = jnp.maximum(idx, 0)
    if any_hit:
        return t, idx, found
    return jnp.where(found, t, jnp.inf), idx, found
