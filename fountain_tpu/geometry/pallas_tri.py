"""Pallas TPU kernel: fused Möller–Trumbore sweep (flash-intersect).

The dense tensor path (geometry/tensor_tri.py) is HBM-bound: each face
block materializes an [N, 4C] pair matrix in HBM. This kernel fuses the
matmul, the acceptance epilogue, and the running per-ray (t, index) min
inside VMEM — the pair matrix never leaves the chip (the same fusion
structure as flash attention).

Round-3 redesign, driven by measurement on TPU v5e (see BASELINE.md):

- The sweep is *pair-bound*, not precision-bound: the VPU acceptance
  epilogue over all N×F candidate pairs costs the same at K=16 as at
  K=96, so the win is culling pairs, not shrinking the contraction.
- Faces arrive in LBVH leaf order (geometry.bvh.attach_bvh), so
  contiguous 128-face blocks are spatially tight. Each ray tile runs ONE
  vectorized [BN, n_blocks] slab pre-cull (every ray against every block
  AABB — ~25 VPU ops per pair, ~2 us/tile) producing per-block
  candidate-ray counts plus each block's earliest slab-entry distance;
  the traversal loop then costs one scalar count test (plus a
  front-to-back entry-distance gate) per block instead of a vector slab
  + scalar sync each. The previous per-block [BN, 1] slab chain was
  13 ms/sweep of pure walk overhead ([BN, 1] shapes pad 128x on the TPU
  lane axis — the measured cost of "scalarish" wavefront code).
- The 4 Möller-Trumbore quantities are ONE MXU dot per block:
  [BN, 96] @ [96, 4*BC] against a quantity-interleaved table, then
  static column slices — 4x fewer MXU issues.
- This is the wavefront analog of the reference's node-stack early-out
  (bvh.rs:176): block AABBs are the "nodes", the bitmask is the stack.

Precision: every Möller–Trumbore quantity is a K=10 dot, so the MXU's
K=128 systolic depth is mostly idle. The three-way bf16 split (hi+mid+lo
recovers all 24 f32 mantissa bits) is folded INTO the K axis: the 6
significant cross terms hh,hm,mh,hl,mm,lh become one K=96 bf16 dot —
full f32 fidelity in ONE MXU pass. Measured on the 100k-interior-ray
watertight gate: 0 leaks, t relative error ~1e-7 (same as HIGHEST).

Shadow (any-hit) rays use a dedicated kernel: no (t, idx) reduction, a
per-superblock early-out once every live ray is occluded, and the same
bf16x6 table (occlusion shares the closest-hit acceptance epsilons, so
the two paths can never disagree about what blocks light).

Occupancy: a scalar-prefetched ``n_active`` ray count lets whole ray
tiles skip all traversal work; callers sort the wavefront with dead lanes
last (sort_keys with the active mask) so terminated lanes cluster into
skippable tiles.

Derivation and epsilon policy: see tensor_tri.py (identical math; the
watertight REL_EPS edge expansion is shared via the packed features).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fountain_tpu.core.vecmath import V3
from fountain_tpu.geometry.tensor_tri import REL_EPS

BN = 1024    # rays per grid tile
BC = 128     # faces per leaf block (one MXU sweep [BN,96]@[96,512])
SB = 1024    # faces per superblock (8 blocks share one early-out cond)
CHUNK = 8192  # max faces resident per outer grid step (bf16 table ~6.3 MiB)
_K = 16      # padded ray-feature depth (10 used)
_K6 = 6 * _K  # six bf16x6 cross terms folded into the contraction axis

# K-slot pairing of the 6 significant bf16x6 cross terms: slot k of the
# ray features uses split _RF_SPLITS[k], slot k of the face table uses
# _TBL_SPLITS[k]; their products sum to hh+hm+mh+hl+mm+lh (the dropped
# ml/lm/ll terms are < 2^-40 relative).
_RF_SPLITS = (0, 0, 1, 0, 1, 2)   # hi, hi, mid, hi, mid, lo
_TBL_SPLITS = (0, 1, 0, 2, 1, 0)  # hi, mid, hi, lo, mid, hi


def _split3(x: np.ndarray):
    """Three-way bf16 split: x ≈ hi + mid + lo covering 24 mantissa bits."""
    bf = ml_dtypes.bfloat16
    hi = x.astype(bf)
    r = x - hi.astype(np.float64)
    mid = r.astype(bf)
    lo = (r - mid.astype(np.float64)).astype(bf)
    return hi, mid, lo


def pack_features_pallas(tri_verts: np.ndarray):
    """Feature + AABB tables for the fused sweep.

    Returns (feat [S, 96, 4*CH] bf16, aabbT [S, 8, nblk] f32) where
    CH ≤ CHUNK faces are resident per outer grid step, S = ceil(F/CH) and
    nblk = CH/BC. feat block c holds the quantity-interleaved columns
    [det | u_num | v_num | t_num] × BC at offset 4*BC*c, so one MXU dot
    yields all four Möller-Trumbore quantities. aabbT rows are
    (xmin, ymin, zmin, xmax, ymax, zmax, valid, 0) — transposed for the
    vectorized [BN, nblk] pre-cull. Row 6 is an explicit validity flag
    (1 = real faces, 0 = padding): the slab test's min/max sort would
    de-invert an inverted-AABB convention, so padding blocks are masked
    via this flag in _precull instead.
    """
    tv = np.asarray(tri_verts, np.float64)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    n = np.cross(e1, e2)
    w1 = np.cross(v0, e1)
    w2 = np.cross(v0, e2)
    k = (v0 * n).sum(-1)
    f = len(tv)
    f_sb = -(-max(f, 1) // SB) * SB          # pad to superblock multiple
    # multi-chunk scenes stream feat blocks through a double-buffered
    # pipeline: two CHUNK-sized bf16 blocks (2 x 6.3 MiB) plus the MXU
    # dot scratch overflow the 16 MiB scoped VMEM (observed at 277k
    # faces, round 5) — halve the resident chunk when streaming.
    # Single-chunk scenes (<= CHUNK faces after padding) keep one
    # full-size block.
    ch = min(f_sb, CHUNK if f_sb <= CHUNK else CHUNK // 2)
    s_blocks = -(-f_sb // ch)
    fpad = s_blocks * ch
    q = np.zeros((4, _K, fpad), np.float64)
    q[0, 0:3, :f] = -n.T                  # det   = -d.n
    q[1, 0:3, :f] = w2.T                  # u_num =  d.w2 + (oxd).e2
    q[1, 3:6, :f] = e2.T
    q[2, 0:3, :f] = -w1.T                 # v_num = -d.w1 - (oxd).e1
    q[2, 3:6, :f] = -e1.T
    q[3, 6:9, :f] = n.T                   # t_num =  o.n - k
    q[3, 9, :f] = -k
    splits = _split3(q)                   # each [4, 16, Fpad] bf16
    tbl = np.concatenate([splits[i] for i in _TBL_SPLITS], axis=1)
    # [4, 96, Fpad] -> quantity-interleave per block -> [S, 96, 4*CH]
    nblk_total = fpad // BC
    tbl = tbl.reshape(4, _K6, nblk_total, BC)
    tbl = tbl.transpose(1, 2, 0, 3)       # [96, nblk, 4, BC]
    feat = np.ascontiguousarray(
        tbl.reshape(_K6, s_blocks, 4 * ch).transpose(1, 0, 2))

    tvf = np.asarray(tri_verts, np.float32)
    nblk = ch // BC
    aabb = np.zeros((s_blocks, nblk, 8), np.float32)
    for b in range(-(-max(f, 1) // BC)):
        blk = tvf[b * BC:(b + 1) * BC].reshape(-1, 3)
        if len(blk):
            aabb[b // nblk, b % nblk, 0:3] = blk.min(0)
            aabb[b // nblk, b % nblk, 3:6] = blk.max(0)
            aabb[b // nblk, b % nblk, 6] = 1.0   # validity flag
    aabbT = np.ascontiguousarray(aabb.transpose(0, 2, 1))  # [S, 8, nblk]
    return jnp.asarray(feat), jnp.asarray(aabbT)


def pack_block_bounds(tri_verts: np.ndarray) -> jnp.ndarray:
    """Back-compat shim: block AABBs now come from pack_features_pallas."""
    return pack_features_pallas(tri_verts)[1]


def _split3_cols(x):
    """In-kernel three-way bf16 split of a [BN, _K] f32 block."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _ray_setup(aux):
    """Unpack the [BN, 8] aux rows into (o, d, inv_d columns, rf): the
    bf16x6 ray feature block rf [BN, 96] (R = [d, o×d, o, 1, 0...]) is
    built in VMEM — no [N, 96] HBM array, ~BN*16 VPU flops per tile."""
    ox, oy, oz = aux[:, 0:1], aux[:, 1:2], aux[:, 2:3]
    dx, dy, dz = aux[:, 3:4], aux[:, 4:5], aux[:, 5:6]
    cxd = jnp.concatenate(
        [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx], axis=1)
    ones = jnp.ones((aux.shape[0], 1), jnp.float32)
    zeros = jnp.zeros((aux.shape[0], _K - 10), jnp.float32)
    rf32 = jnp.concatenate([aux[:, 3:6], cxd, aux[:, 0:3], ones, zeros],
                           axis=1)                             # [BN, 16]
    sp = _split3_cols(rf32)
    rf = jnp.concatenate([sp[k] for k in _RF_SPLITS], axis=1)  # [BN, 96]
    return rf


def _precull(aux, aabbT_ref, t_cap):
    """Vectorized slab test of every ray in the tile against every block
    AABB: one [BN, nblk] computation instead of nblk scalar-synced [BN,1]
    chains. Returns (cnt [nblk] int32, tn_blk [nblk] f32): per-block
    candidate-ray counts and the earliest slab entry distance of any
    candidate ray; the walk reads both with static extracts (see the
    comment below). Conservative 1e-4 relative expansion on t_far;
    padding blocks are rejected via the aabbT row-6 validity flag."""
    nblk = aabbT_ref.shape[-1]
    t_near = None
    t_far = None
    for a in range(3):
        bmin = aabbT_ref[0, a, :][None, :]          # [1, nblk]
        bmax = aabbT_ref[0, 3 + a, :][None, :]
        o_c = aux[:, a:a + 1]                       # [BN, 1]
        d_c = aux[:, 3 + a:4 + a]
        inv = 1.0 / jnp.where(d_c == 0.0, 1e-20, d_c)
        t0 = (bmin - o_c) * inv                     # [BN, nblk]
        t1 = (bmax - o_c) * inv
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        t_near = lo if t_near is None else jnp.maximum(t_near, lo)
        t_far = hi if t_far is None else jnp.minimum(t_far, hi)
    t_far = t_far * 1.0001
    valid_blk = aabbT_ref[0, 6, :][None, :] > 0.0   # [1, nblk]
    can = ((t_near <= t_far) & (t_far > 0.0) & (t_near < t_cap[:, 0:1])
           & valid_blk)
    # per-block candidate-ray count [nblk] int32 plus the earliest entry
    # distance of any candidate ray [nblk] f32; scalar tests in the walk
    # read both with STATIC extracts (Mosaic supports neither dynamic
    # vector extract nor 1-D reshape). The entry distance drives the
    # approximate front-to-back gate: once every ray's running best-t is
    # below a block's earliest entry, the block is provably occluded —
    # the wavefront analog of the t_max shrink in the reference's node
    # walk (bvh.rs:176,197).
    cnt = jnp.sum(can.astype(jnp.int32), axis=0)
    tn_blk = jnp.min(jnp.where(can, t_near, jnp.float32(3e38)), axis=0)
    return cnt, tn_blk


def _mt_block(rf, feat_ref, c, t_eps):
    """One MXU dot [BN,96]@[96,4*BC] for face block ``c`` (dynamic), then
    the acceptance epilogue. Returns (valid_base, T, adet): valid pairs
    with T/adet > t_eps (the t_best/t_cap window is applied by callers)."""
    dot = jax.lax.dot_general(
        rf, feat_ref[0, :, pl.ds(c * (4 * BC), 4 * BC)],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [BN, 4*BC]
    det = dot[:, 0 * BC:1 * BC]
    u_num = dot[:, 1 * BC:2 * BC]
    v_num = dot[:, 2 * BC:3 * BC]
    t_num = dot[:, 3 * BC:4 * BC]
    sg = jnp.sign(det)
    adet = jnp.abs(det)
    U = u_num * sg
    V = v_num * sg
    T = t_num * sg
    eps = REL_EPS * adet
    valid = (adet > 1e-20) \
        & (U >= -eps) & (V >= -eps) & (U + V <= adet + eps) \
        & (T > t_eps * adet)
    return valid, T, adet


def _kernel(nact_ref, aux_ref, feat_ref, aabbT_ref,
            t_ref, idx_ref, *, nsb: int, t_eps: float):
    i = pl.program_id(1)
    s = pl.program_id(0)
    live = i * BN < nact_ref[0]
    ch = feat_ref.shape[-1] // 4

    @pl.when(live)
    def _work():
        aux = aux_ref[...]                    # [BN, 8] f32: o, d, t_cap
        rf = _ray_setup(aux)
        t_cap = aux[:, 6:7]
        cnt, tn_blk = _precull(aux, aabbT_ref, t_cap)
        # 1-D [BN] carries: [BN, 1] shapes pad 128x on the lane axis
        carry0 = (t_cap[:, 0], jnp.full((aux.shape[0],), -1, jnp.int32),
                  jnp.max(t_cap[:, 0]))

        def test_block(c, carry):
            t_best, i_best, _ = carry
            valid, T, adet = _mt_block(rf, feat_ref, c, t_eps)
            valid = valid & (T < t_best[:, None] * adet)
            t = jnp.where(valid, T / jnp.where(adet == 0.0, 1.0, adet),
                          jnp.float32(3e38))
            # reduction-only block argmin (Mosaic has no row gather): min
            # t, then min column index among entries equal to it
            t_c = jnp.min(t, axis=1)                             # [BN]
            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            j = jnp.min(jnp.where(t <= t_c[:, None], cols,
                                  jnp.int32(1 << 30)), axis=1)
            better = t_c < t_best
            t_best = jnp.where(better, t_c, t_best)
            i_best = jnp.where(better, s * ch + c * BC + j, i_best)
            return t_best, i_best, jnp.max(t_best)

        # both walk levels unrolled in python: all vector extracts and
        # feat slices are static (Mosaic has no dynamic extract), and a
        # not-taken cond costs ~0.14 us — ~45 conds/tile is noise
        carry = carry0
        for b in range(nsb):
            s_lo, s_hi = b * 8, (b + 1) * 8
            sb_cnt = jnp.sum(jax.lax.slice(cnt, (s_lo,), (s_hi,)))
            sb_tn = jnp.min(jax.lax.slice(tn_blk, (s_lo,), (s_hi,)))

            def sb_take(cr, s_lo=s_lo, s_hi=s_hi):
                for c in range(s_lo, s_hi):
                    cr = jax.lax.cond(
                        (cnt[c] > 0) & (tn_blk[c] < cr[2]),
                        functools.partial(test_block, c),
                        lambda x: x, cr)
                return cr

            carry = jax.lax.cond((sb_cnt > 0) & (sb_tn < carry[2]),
                                 sb_take, lambda cr: cr, carry)
        t_best, i_best, _ = carry
        t_ref[0, i, :] = t_best
        idx_ref[0, i, :] = i_best

    @pl.when(jnp.logical_not(live))
    def _skip():
        t_ref[0, i, :] = jnp.full((aux_ref.shape[0],), 3e38, jnp.float32)
        idx_ref[0, i, :] = jnp.full((aux_ref.shape[0],), -1, jnp.int32)


def _kernel_any(nact_ref, aux_ref, feat_ref, aabbT_ref,
                occ_ref, *, nsb: int, t_eps: float):
    """Occlusion (any-hit) sweep: per-ray bool (as int32 — bool vectors do
    not legalize through scf.if), per-superblock early-out once every live
    ray is occluded (reference intersect_test early-out, bvh.rs:217-266).
    The t window is (t_eps, t_cap) — identical acceptance to the
    closest-hit kernel, so shadow and camera rays can never disagree."""
    i = pl.program_id(1)
    live = i * BN < nact_ref[0]

    @pl.when(live)
    def _work():
        aux = aux_ref[...]
        rf = _ray_setup(aux)
        t_cap = aux[:, 6:7]
        cnt, _ = _precull(aux, aabbT_ref, t_cap)
        occ0 = jnp.zeros((aux.shape[0],), jnp.int32)
        n_need = jnp.sum((t_cap[:, 0] > 0.0).astype(jnp.int32))

        def test_block(c, occ):
            window = jnp.where(occ > 0, jnp.float32(-1.0), t_cap[:, 0])
            valid, T, adet = _mt_block(rf, feat_ref, c, t_eps)
            valid = valid & (T < window[:, None] * adet)
            return occ | jnp.any(valid, axis=1).astype(jnp.int32)

        occ = occ0
        for b in range(nsb):
            sb_cnt = jnp.sum(jax.lax.slice(cnt, (b * 8,), ((b + 1) * 8,)))

            def sb_take(oc, b=b):
                for c in range(b * 8, (b + 1) * 8):
                    oc = jax.lax.cond(cnt[c] > 0,
                                      functools.partial(test_block, c),
                                      lambda x: x, oc)
                return oc

            # early-out: skip once every ray needing a verdict has one
            todo = (sb_cnt > 0) & (jnp.sum(occ) < n_need)
            occ = jax.lax.cond(todo, sb_take, lambda oc: oc, occ)
        occ_ref[0, i, :] = occ

    @pl.when(jnp.logical_not(live))
    def _skip():
        occ_ref[0, i, :] = jnp.zeros((aux_ref.shape[0],), jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("t_eps", "any_hit", "interpret"))
def _sweep(n_active, aux, feat, aabbT,
           t_eps: float = 1e-4, any_hit: bool = False,
           interpret: bool = False):
    n = aux.shape[0]
    n_tiles = n // BN
    s_blocks = feat.shape[0]
    nblk = aabbT.shape[-1]
    nsb = nblk // 8
    if any_hit:
        kern = functools.partial(_kernel_any, nsb=nsb, t_eps=t_eps)
        out_shape = [jax.ShapeDtypeStruct((s_blocks, n_tiles, BN),
                                          jnp.int32)]
        out_specs = [pl.BlockSpec((1, n_tiles, BN),
                                  lambda s, i, *_: (s, 0, 0))]
    else:
        kern = functools.partial(_kernel, nsb=nsb, t_eps=t_eps)
        out_shape = [
            jax.ShapeDtypeStruct((s_blocks, n_tiles, BN), jnp.float32),
            jax.ShapeDtypeStruct((s_blocks, n_tiles, BN), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((1, n_tiles, BN), lambda s, i, *_: (s, 0, 0)),
            pl.BlockSpec((1, n_tiles, BN), lambda s, i, *_: (s, 0, 0)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((BN, 8), lambda s, i, *_: (i, 0)),      # aux
            pl.BlockSpec((1, _K6, feat.shape[-1]),
                         lambda s, i, *_: (s, 0, 0)),
            pl.BlockSpec((1, 8, nblk), lambda s, i, *_: (s, 0, 0)),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(n_active, aux, feat, aabbT)
    if any_hit:
        occ = outs[0].reshape(s_blocks, n)
        return (occ != 0).any(axis=0)
    t_part, i_part = outs
    tp = t_part.reshape(s_blocks, n)
    ip = i_part.reshape(s_blocks, n)
    if s_blocks == 1:
        return tp[0], ip[0]
    # min over the chunk axis (ties -> lowest s -> lowest face index,
    # matching the tensor path's first-argmin convention)
    s_star = jnp.argmin(tp, axis=0)[None]              # [1, n]
    t = jnp.take_along_axis(tp, s_star, axis=0)[0]
    idx = jnp.take_along_axis(ip, s_star, axis=0)[0]
    return t, idx


def _morton16(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave three 5-bit ints into a 15-bit Morton code
    (same bit trick as geometry.bvh.morton3, vectorized in jnp)."""
    def expand(v):
        v = (v | (v << 8)) & 0x100F
        v = (v | (v << 4)) & 0x10C3
        v = (v | (v << 2)) & 0x1249
        return v
    qx, qy, qz = q
    return (expand(qz) << 2) | (expand(qy) << 1) | expand(qx)


def sort_keys(o: V3, d: V3) -> jnp.ndarray:
    """Spatial-coherence sort key per ray: Morton(origin cell) in the high
    bits, Morton(direction octant cell) low — rays that start near each
    other and point the same way land in the same kernel tile, so the
    per-tile block pre-cull (see _precull) actually prunes blocks.
    This is the wavefront analog of the tile decomposition the reference
    gets for free from its scanline tiles (integrator/mod.rs:199)."""
    def qcell(c):
        lo = jnp.min(c)
        hi = jnp.max(c)
        return jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-12) * 31.0,
                        0.0, 31.0).astype(jnp.int32)
    qo = (qcell(o.x), qcell(o.y), qcell(o.z))
    qd = tuple(jnp.clip((c * 0.5 + 0.5) * 31.0, 0.0, 31.0).astype(jnp.int32)
               for c in d)
    return (_morton16(qo) << 15) | _morton16(qd)


def mt_intersect_pallas(qdata, o: V3, d: V3, t_max,
                        t_eps: float = 1e-4, any_hit: bool = False,
                        interpret: bool = False, sort: bool = True,
                        active=None, presorted: bool = False):
    """Drop-in for tensor_tri.mt_intersect using the fused kernel.

    qdata: pack_features_pallas output; o/d component-SoA V3 of [N],
    t_max [N] (< 0 = lane dead). With sort=True (default) the wavefront is
    Morton-reordered before the sweep and the results scattered back —
    results are bit-identical either way. ``active`` (optional [N] bool)
    sorts dead lanes last and lets trailing ray tiles skip all work
    (wavefront occupancy; the analog of the reference's per-lane break,
    path.rs:84-91).

    ``presorted=True``: the caller has ALREADY clustered live lanes first
    (the keep-permuted bounce loop, integrator.path) — no sort/unsort here;
    ``active`` is then only counted for the trailing-tile skip and must be
    a superset-clustered mask (every True lane within the first
    sum(active) slots); per-lane deadness still rides t_max < 0.

    any_hit=True returns sentinels in the first two tuple slots —
    t = 0/inf and idx = 0/-1 encode only hit/miss, NOT the real hit
    t/index (unlike tensor_tri.mt_intersect's any-hit mode); consume only
    the boolean third element.

    VMEM ceiling: each grid step keeps the whole [n_tiles, BN] output
    slab(s) resident alongside the ~6.3 MiB feature chunk; waves beyond
    ~0.5M rays may exceed the 16 MiB v5e VMEM budget. Callers tile the
    wavefront (render drives <= 512x512 lanes per wave) rather than
    growing n.
    """
    qfeat, qaabbT = qdata
    n = o.shape[0]
    npad = -(-n // BN) * BN
    # (t, idx) carry no gradient path to scene parameters; detach the ray
    # inputs so reverse-mode never tries to differentiate the kernel
    sg = jax.lax.stop_gradient
    o, d, t_max = sg(o), sg(d), sg(t_max)
    if active is not None:
        active = sg(active)
    # Rays travel as FLAT [N] component arrays until the very last moment:
    # any [N, C<128] stack forces its producer fusions to emit
    # f32[N,1]{T(8,128)} buffers padded 128x (134 MB each at 262k — the
    # round-5 profile showed these dominating the step). The flat columns
    # are concatenated [8*N] (pad-free) and ONE transpose materializes
    # the kernel's [N, 8] aux input.
    t_cap = jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3e38))
    shape = t_cap.shape
    cols = [jnp.broadcast_to(o.x, shape), jnp.broadcast_to(o.y, shape),
            jnp.broadcast_to(o.z, shape), jnp.broadcast_to(d.x, shape),
            jnp.broadcast_to(d.y, shape), jnp.broadcast_to(d.z, shape),
            t_cap, jnp.zeros_like(t_cap)]
    if npad != n:
        cols = [jnp.pad(c, (0, npad - n), constant_values=-1.0)
                for c in cols]              # padded lanes: t_cap = -1
    # concat flat + one transpose (NOT jnp.stack): a stack's producer
    # fusions must emit f32[N,1]{T(8,128)} buffers padded 128x; the flat
    # concat keeps every producer pad-free and a single transpose
    # materializes the kernel's [N, 8] input
    aux = jnp.concatenate(cols).reshape(8, npad).T
    perm = inv_perm = None
    if not presorted and (sort or active is not None) and n > BN:
        key = sort_keys(o, d)
        if active is not None:
            key = jnp.where(active, key, jnp.int32(2**31 - 1))
        if npad != n:
            key = jnp.pad(key, (0, npad - n),
                          constant_values=jnp.int32(2**31 - 1))
        perm = jnp.argsort(key)
        # inverse permutation: unsorting becomes a gather instead of a
        # row scatter (a 262k scatter measured ~1.2 ms vs ~0.2 ms for
        # the gather + ~0.25 ms for this extra argsort on v5e)
        inv_perm = jnp.argsort(perm)
        aux = aux[perm]                     # ONE [N, 8] row gather
    if active is None:
        n_active = jnp.full((1,), npad, jnp.int32)
    else:
        n_active = jnp.sum(active, dtype=jnp.int32)[None]
    if any_hit:
        occ = _sweep(n_active, aux, qfeat, qaabbT, t_eps=t_eps,
                     any_hit=True, interpret=interpret)
        if perm is not None:
            occ = occ.astype(jnp.int32)[inv_perm] != 0  # gather-unsort
        occ = occ[:n]
        t = jnp.where(occ, 0.0, jnp.inf)
        return t, jnp.where(occ, 0, -1), occ
    t, idx = _sweep(n_active, aux, qfeat, qaabbT, t_eps=t_eps,
                    interpret=interpret)
    if perm is not None:
        # unsort via ONE row GATHER with the inverse permutation of the
        # packed (t, idx) pair. The pair travels as int32 (t bitcast):
        # f32 transport would NaN-canonicalize idx = -1 (0xFFFFFFFF) on
        # TPU and turn misses into hits.
        pair = jnp.concatenate(
            [jax.lax.bitcast_convert_type(t, jnp.int32), idx]
        ).reshape(2, npad).T                # [Npad, 2] i32, pad-free build
        out = pair[inv_perm]
        t = jax.lax.bitcast_convert_type(out[:, 0], jnp.float32)
        idx = out[:, 1]
    t = t[:n]
    idx = idx[:n]
    found = idx >= 0
    idx = jnp.maximum(idx, 0)
    return jnp.where(found, t, jnp.inf), idx, found
