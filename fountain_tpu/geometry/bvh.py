"""LBVH: Morton-ordered BVH build + stackless threaded traversal.

TPU-native replacement for the reference BVH (src/bvh.rs):

- **Build** (host-side): the reference's sequential recursive Middle split
  (bvh.rs:66-120) cannot run on device; instead we build an LBVH from
  30-bit Morton codes (the bit-interleave trick the reference defined but
  never used, src/morton.rs:3-36) — centroids quantized to a 2^10 lattice,
  sorted, then median-split on the highest differing bit (Karras-style
  implicit hierarchy). Degenerate ranges (equal codes) fall back to an
  object-median split like the reference's EqualCounts
  (bvh.rs:122-130).
- **Layout**: DFS-ordered nodes with *miss links* (a threaded BVH) instead
  of the reference's second-child offsets (bvh.rs:269-302). Traversal then
  needs a single node pointer per lane — no per-lane stack — which is the
  natural formulation for vector hardware: the whole wavefront advances
  through a `lax.while_loop`, each lane carrying one int.
- **Traversal**: slab AABB test with the conservative 1+2γ(3) scaling
  (bounds.rs:214-233) against precomputed inverse directions; leaves hold
  up to LEAF_SIZE triangles tested with the watertight kernel.

Node arrays (M nodes):
  nodes_min/max: [M, 3] f32
  meta:          [M, 3] int32 = (miss_link, first_prim, prim_count)
                 prim_count == 0 → interior (hit continues to node i+1)
  prim_order:    [F] int32 leaf-ordered face permutation
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fountain_tpu.core.vecmath import Float, gamma
from fountain_tpu.geometry.triangle import woop_intersect
from fountain_tpu.scene.types import Triangles

LEAF_SIZE = 4


class BvhArrays(NamedTuple):
    nodes_min: jnp.ndarray
    nodes_max: jnp.ndarray
    meta: jnp.ndarray
    prim_order: jnp.ndarray


# ---------------------------------------------------------------------------
# Host-side build
# ---------------------------------------------------------------------------


def _expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so consecutive bits are 3 apart
    (reference morton.rs:25-36 magic-constant version)."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """30-bit Morton code from coordinates in [0, 1024) (morton.rs:3-14)."""
    return (_expand_bits(z) << np.uint32(2)) | (_expand_bits(y) << np.uint32(1)) \
        | _expand_bits(x)


def build_lbvh(bounds_min: np.ndarray, bounds_max: np.ndarray,
               leaf_size: int = LEAF_SIZE
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build the threaded LBVH over primitive AABBs (host).

    Uses the native C++ builder (fountain_tpu.native, the analog of the
    reference's native build bvh.rs:27-158) when available; the numpy/
    python path below is the byte-identical fallback.
    Returns (nodes_min [M,3], nodes_max [M,3], meta [M,3], prim_order [F]).
    """
    f = len(bounds_min)
    if f > 0:
        from fountain_tpu import native
        out = native.lbvh_build(bounds_min, bounds_max, leaf_size)
        if out is not None:
            return out
    centroids = (bounds_min + bounds_max) * 0.5
    lo = centroids.min(0)
    extent = np.maximum(centroids.max(0) - lo, 1e-12)
    q = np.clip(((centroids - lo) / extent) * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int32)
    codes = codes[order]
    bmin = bounds_min[order]
    bmax = bounds_max[order]

    nodes_min, nodes_max, meta = [], [], []

    # iterative DFS with explicit stack; emits nodes in DFS order and
    # patches miss links afterwards
    def emit(n_min, n_max, first, count):
        nodes_min.append(n_min)
        nodes_max.append(n_max)
        meta.append([0, first, count])
        return len(meta) - 1

    # subtree ranges processed with a manual stack of (start, end, parent_done)
    # we need child sizes before emitting, so compute splits recursively but
    # iteratively with a post-patch of miss links via subtree sizes.
    import sys
    sys.setrecursionlimit(1 << 16)

    # prefix AABBs make range-bounds O(1)? simpler: compute on the fly (the
    # total work is O(n log n) with numpy slicing)
    def split_pos(start, end):
        """Morton split: highest differing bit within [start, end)."""
        c0, c1 = codes[start], codes[end - 1]
        if c0 == c1:
            return (start + end) // 2
        diff = int(c0 ^ c1)
        split_bit = diff.bit_length() - 1
        # first index whose bit `split_bit` differs from c0's
        mask = np.uint32(1 << split_bit)
        vals = (codes[start:end] & mask) != (c0 & mask)
        idx = int(np.argmax(vals))
        return start + max(idx, 1)

    def rec(start, end):
        n_min = bmin[start:end].min(0)
        n_max = bmax[start:end].max(0)
        if end - start <= leaf_size:
            emit(n_min, n_max, start, end - start)
            return
        mid = split_pos(start, end)
        me = emit(n_min, n_max, 0, 0)
        rec(start, mid)
        rec(mid, end)
        # miss link of my left subtree's last... handled in the patch pass
        meta[me][1] = mid  # stash split (unused later, debug aid)

    if f == 0:
        return (np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
                np.asarray([[1, 0, 0]], np.int32), order)
    rec(0, f)

    m = len(meta)
    meta_np = np.asarray(meta, np.int64)
    # compute subtree sizes to patch miss links: node i's subtree occupies
    # [i, i + size_i); miss_link = i + size_i
    sizes = np.ones(m, np.int64)
    # DFS order → children are contiguous after parent; compute sizes by a
    # reverse sweep with a stack
    stack = []
    for i in range(m - 1, -1, -1):
        if meta_np[i, 2] > 0:  # leaf
            sizes[i] = 1
            stack.append(1)
        else:
            right = stack.pop()
            left = stack.pop()
            sizes[i] = 1 + left + right
            stack.append(int(sizes[i]))
    miss = np.arange(m, dtype=np.int64) + sizes
    meta_out = np.stack([miss,
                         meta_np[:, 1] * (meta_np[:, 2] > 0),
                         meta_np[:, 2]], axis=1).astype(np.int32)
    return (np.stack(nodes_min).astype(np.float32),
            np.stack(nodes_max).astype(np.float32),
            meta_out, order)


def pack_nodes(nodes_min: np.ndarray, nodes_max: np.ndarray,
               meta: np.ndarray) -> np.ndarray:
    """One 8-float row per node so a traversal step is a single row gather:
    [min.xyz, max.xyz, bitcast(miss), bitcast(first<<3 | count)]."""
    miss = meta[:, 0].astype(np.int32)
    fc = ((meta[:, 1].astype(np.int64) << 3)
          | meta[:, 2].astype(np.int64)).astype(np.int32)
    assert int(meta[:, 1].max(initial=0)) < (1 << 28), "face count overflow"
    assert int(meta[:, 2].max(initial=0)) <= 7, "leaf size must be <= 7"
    return np.concatenate([
        nodes_min.astype(np.float32), nodes_max.astype(np.float32),
        miss.view(np.float32)[:, None], fc.view(np.float32)[:, None]],
        axis=1)


def attach_bvh(scene, leaf_size: int = LEAF_SIZE):
    """Build the LBVH for the scene's triangle table and return a scene with
    BVH arrays attached (faces reordered to leaf order)."""
    tris = scene.triangles
    if tris.count == 0:
        return scene
    pos = np.asarray(tris.positions)
    idx = np.asarray(tris.indices)
    v = pos[idx]  # [F, 3, 3]
    bmin = v.min(1)
    bmax = v.max(1)
    nodes_min, nodes_max, meta, order = build_lbvh(bmin, bmax, leaf_size)
    # reorder per-face arrays to leaf order (reference apply_permutation,
    # bvh.rs:355-374)
    reordered = Triangles(
        positions=tris.positions,
        indices=tris.indices[order],
        normals=tris.normals,
        has_normals=tris.has_normals[order],
        uv=tris.uv,
        mat_id=tris.mat_id[order],
        light_id=tris.light_id[order],
        flip_normal=tris.flip_normal[order],
        mesh_id=tris.mesh_id[order])
    from fountain_tpu.geometry.tensor_tri import (MAX_DENSE_FACES,
                                                  build_tri_features)
    dense = tris.count <= MAX_DENSE_FACES
    feats = build_tri_features(v[order]) if dense else None
    # the Pallas path streams face superblocks from HBM (two-level cull),
    # so it has no VMEM face cap — attach for every scene size
    from fountain_tpu.geometry.pallas_tri import pack_features_pallas
    qfeat = pack_features_pallas(v[order])
    from fountain_tpu.geometry.triangle import build_tri_attr
    return scene._replace(
        triangles=reordered,
        bvh_nodes_min=jnp.asarray(nodes_min),
        bvh_nodes_max=jnp.asarray(nodes_max),
        bvh_meta=jnp.asarray(meta),
        bvh_nodes8=jnp.asarray(pack_nodes(nodes_min, nodes_max, meta)),
        bvh_tri_verts=jnp.asarray(v[order]),
        tri_features=feats,
        tri_qfeat=qfeat,
        tri_attr=build_tri_attr(reordered, v[order]))


# ---------------------------------------------------------------------------
# Device traversal
# ---------------------------------------------------------------------------

_RAY_EPS = 1e-4


def _slab_test(nmin, nmax, o, inv_d, t_best):
    """Conservative slab AABB test (reference bounds.rs:214-233; the
    1 + 2γ(3) expansion on t_far makes the test err towards 'hit')."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) * (1.0 + 2.0 * gamma(3))
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)


def bvh_intersect(tris: Triangles, nodes_min, nodes_max, meta, o, d, t_max,
                  any_hit: bool = False, nodes8=None, tri_verts=None):
    """Wavefront threaded-BVH traversal.

    Returns (t, face_idx, valid) for closest-hit, or (-, -, hit) bool for
    any_hit. Every lane carries (node_ptr, t_best, idx_best); the while
    loop runs until all lanes reach the end pointer M.

    With `nodes8`/`tri_verts` (the packed layout from attach_bvh) each
    traversal step costs ONE node-row gather and each leaf slot ONE
    9-float row gather — the TPU-shaped memory layout; the unpacked path
    is kept for oracle tests.
    """
    m = meta.shape[0] if nodes8 is None else nodes8.shape[0]
    n = o.shape[:-1]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    t0 = jnp.where(jnp.isfinite(t_max), t_max, jnp.float32(3e38))

    def cond(carry):
        ptr = carry[0]
        return jnp.any(ptr < m)

    def body(carry):
        ptr, t_best, i_best, found = carry
        active = ptr < m
        ptr_c = jnp.minimum(ptr, m - 1)
        if nodes8 is not None:
            row = nodes8[ptr_c]
            nmin = row[..., 0:3]
            nmax = row[..., 3:6]
            miss = jax.lax.bitcast_convert_type(row[..., 6], jnp.int32)
            fc = jax.lax.bitcast_convert_type(row[..., 7], jnp.int32)
            first = fc >> 3
            count = fc & 7
        else:
            nmin = nodes_min[ptr_c]
            nmax = nodes_max[ptr_c]
            miss = meta[ptr_c, 0]
            first = meta[ptr_c, 1]
            count = meta[ptr_c, 2]

        hit_box = _slab_test(nmin, nmax, o, inv_d, t_best) & active
        is_leaf = (count > 0) & hit_box

        # test up to LEAF_SIZE prims, masked by slot < count
        for s in range(LEAF_SIZE):
            fidx = jnp.minimum(first + s, tris.count - 1)
            if tri_verts is not None:
                p = tri_verts[fidx]
            else:
                i3 = tris.indices[fidx]
                p = tris.positions[i3]
            t, _, _, _, ok = woop_intersect(
                p[..., 0, :], p[..., 1, :], p[..., 2, :], o, d, t_best)
            ok = ok & is_leaf & (s < count)
            t_best = jnp.where(ok, t, t_best)
            i_best = jnp.where(ok, fidx.astype(jnp.int32), i_best)
            found = found | ok

        nxt = jnp.where(hit_box & ~is_leaf, ptr_c + 1, miss)
        ptr = jnp.where(active, nxt, ptr)
        if any_hit:
            # lanes that found any hit can stop traversing
            ptr = jnp.where(found, m, ptr)
        return ptr, t_best, i_best, found

    init = (jnp.zeros(n, jnp.int32), t0, jnp.zeros(n, jnp.int32),
            jnp.zeros(n, bool))
    _, t_best, i_best, found = jax.lax.while_loop(cond, body, init)
    return jnp.where(found, t_best, jnp.inf), i_best, found
