"""Tensor (MXU) ray-triangle intersection: Möller–Trumbore as ONE matmul.

The TPU-shaped reformulation of the intersection sweep: every pair term of
Möller–Trumbore is bilinear in (ray features) × (triangle features), so
testing N rays against a block of C triangles is a single
[N, 10] @ [10, 4·C] matmul on the MXU plus fused elementwise VPU math —
**zero gathers**, no per-lane control flow. This replaces both the
gather-based BVH walk (hostile to TPU) and the per-pair Woop sweep for
scenes within the dense budget.

Ray features R = [d, o×d, o, 1]  (10 values per lane). Per triangle
(n = e1×e2, w1 = v0×e1, w2 = v0×e2, k = v0·n) the four quantities
  det   = −d·n
  u·det =  (o×d)·e2 + d·w2
  v·det = −(o×d)·e1 − d·w1
  t·det =  o·n − k
are linear in R, packed as a [10, C, 4] feature tensor. Sign-robust
acceptance multiplies through by sign(det) instead of dividing (the
reference's edge-function range test, triangle.rs:239-251, does the
same).

Watertightness: plain MT in f32 can leak on shared edges where u or v
round to barely-negative values; acceptance therefore expands the
barycentric tests by a conservative relative epsilon (REL_EPS·|det|),
counting near-edge grazes as hits on BOTH triangles (double-hit resolves
by nearest-t, never a leak). The watertight Woop sweep remains the
oracle in tests; the 100k-interior-ray leak test passes through this
path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fountain_tpu.core.vecmath import Float, cross
from fountain_tpu.scene.types import Triangles

# relative slack on the barycentric edge tests (units of |det|); covers
# f32 rounding of the bilinear forms
REL_EPS = 1e-4
# dense-path budget: above this face count scenes fall back to the BVH walk
MAX_DENSE_FACES = 65536
# pair-block budget: chunk C chosen so N * C * 4 stays under this many
# floats (bounds the materialized matmul output to ~512 MB)
PAIR_BUDGET = 1 << 27
_HI = jax.lax.Precision.HIGHEST


class TriFeatures(NamedTuple):
    packed: jnp.ndarray  # [10, F, 4] (det, u_num, v_num, t_num) columns

    @property
    def count(self) -> int:
        return self.packed.shape[1]


def build_tri_features(tri_verts: np.ndarray) -> TriFeatures:
    """tri_verts: [F, 3, 3] world vertices (leaf order)."""
    tv = np.asarray(tri_verts, np.float64)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    n = np.cross(e1, e2)
    w1 = np.cross(v0, e1)
    w2 = np.cross(v0, e2)
    k = (v0 * n).sum(-1)
    f = len(tv)
    packed = np.zeros((10, f, 4), np.float32)
    packed[0:3, :, 0] = -n.T            # det        = -d.n
    packed[0:3, :, 1] = w2.T            # u_num      =  d.w2 + (oxd).e2
    packed[3:6, :, 1] = e2.T
    packed[0:3, :, 2] = -w1.T           # v_num      = -d.w1 - (oxd).e1
    packed[3:6, :, 2] = -e1.T
    packed[6:9, :, 3] = n.T             # t_num      =  o.n - k
    packed[9, :, 3] = -k
    return TriFeatures(packed=jnp.asarray(packed))


def _ray_features(o, d):
    oxd = cross(o, d)
    one = jnp.ones(o.shape[:-1] + (1,), Float)
    return jnp.concatenate([d, oxd, o, one], axis=-1)  # [N, 10]


def mt_intersect(feat: TriFeatures, o, d, t_max, chunk: int = 0,
                 t_eps: float = 1e-4, any_hit: bool = False):
    """Closest-hit (or any-hit) over the dense face table.

    o, d: [N, 3]; t_max: [N]. Returns (t, face_idx, valid) — or
    (-, -, blocked) for any_hit. Face blocks are streamed with a running
    per-ray min so the pair matrix never exceeds PAIR_BUDGET floats.
    """
    f = feat.count
    n = o.shape[0]
    if chunk <= 0:
        chunk = int(max(256, min(8192, PAIR_BUDGET // max(n * 4, 1))))
    rf = _ray_features(o, d)
    t_cap = jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3e38))

    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    packed = feat.packed
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))

    def body(ci, carry):
        t_best, i_best, found = carry
        blk = jax.lax.dynamic_slice_in_dim(packed, ci * chunk, chunk, 1)
        out = jnp.matmul(rf, blk.reshape(10, chunk * 4),
                         precision=_HI).reshape(n, chunk, 4)
        det = out[..., 0]
        u_num = out[..., 1]
        v_num = out[..., 2]
        t_num = out[..., 3]

        s = jnp.sign(det)
        adet = jnp.abs(det)
        U = u_num * s
        V = v_num * s
        T = t_num * s
        eps = REL_EPS * adet
        base = ci * chunk
        in_table = (base + jnp.arange(chunk)) < f
        valid = (adet > 1e-20) \
            & (U >= -eps) & (V >= -eps) & (U + V <= adet + eps) \
            & (T > t_eps * adet) & (T < t_best[:, None] * adet) \
            & in_table[None, :]
        t = jnp.where(valid, T / jnp.where(adet == 0.0, 1.0, adet), jnp.inf)
        j = jnp.argmin(t, axis=-1)
        t_c = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
        ok_c = jnp.take_along_axis(valid, j[:, None], -1)[:, 0]
        better = ok_c & (t_c < t_best)
        t_best = jnp.where(better, t_c, t_best)
        i_best = jnp.where(better, (base + j).astype(jnp.int32), i_best)
        return t_best, i_best, found | better

    init = (t_cap, jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    t_best, i_best, found = jax.lax.fori_loop(0, n_chunks, body, init)
    if any_hit:
        return t_best, i_best, found
    return jnp.where(found, t_best, jnp.inf), i_best, found
