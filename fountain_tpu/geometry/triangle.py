"""Watertight ray-triangle intersection over the mesh table.

TPU-native analog of reference ``src/shapes/triangle.rs:176-393``: the
Woop-style translate→permute→shear test with edge functions, conservative
t-error bounds, and interpolated shading frames.

Differences from the reference, justified:
- The reference recomputes zero-valued edge functions in f64
  (triangle.rs:219-223); TPU has no fast f64, so edge functions are always
  computed with an error-free-transformation (Dekker split) compensated
  difference-of-products — *more* accurate than the plain f32 + rare-f64
  scheme and fully branch-free. Watertightness relies on shared edges
  evaluating to exactly-negated values, which the compensated form
  preserves (it is a deterministic function of the two vertices and shear).
- Brute-force sweep is chunked over triangles with a running per-ray
  (t, index) min so [N_rays × F] never materializes; the LBVH traversal
  (geometry.bvh) replaces the full sweep for large meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fountain_tpu.core.vecmath import (Float, V3, coordinate_system, cross,
                                       dot, gamma, length, normalize,
                                       solve_linear_system_2x2, vec, where3)
from fountain_tpu.geometry.intersect import PRIM_NONE, PRIM_TRIANGLE, Hit
from fountain_tpu.scene.types import Triangles

_SPLIT = 4097.0  # 2^12 + 1 Veltkamp split constant for f32 (24-bit mantissa)


def _two_prod(a, b):
    """Error-free product: a*b = p + e exactly (Dekker/Veltkamp in f32)."""
    p = a * b
    a_hi = (a * _SPLIT) - ((a * _SPLIT) - a)
    a_lo = a - a_hi
    b_hi = (b * _SPLIT) - ((b * _SPLIT) - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _diff_of_products(a, b, c, d):
    """Compensated a*b - c*d (exact to ~1 ulp; Kahan's algorithm via EFT)."""
    p1, e1 = _two_prod(a, b)
    p2, e2 = _two_prod(c, d)
    return (p1 - p2) + (e1 - e2)


def _permute_axis(v, kx, ky, kz):
    """Reorder the component axis of [..., 3] by per-lane indices kx/ky/kz.

    kz ∈ {0,1,2} with kx=(kz+1)%3, ky=(kx+1)%3, so the permutation is one
    of three fixed rotations — expressed as elementwise selects (a
    take_along_axis on the minor axis lowers to a per-lane gather, ~40ms
    per call at 262k lanes on TPU; selects are ~free)."""
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    is0 = kz == 0
    is1 = kz == 1
    x = jnp.where(is0, v1, jnp.where(is1, v2, v0))
    y = jnp.where(is0, v2, jnp.where(is1, v0, v1))
    z = jnp.where(is0, v0, jnp.where(is1, v1, v2))
    return jnp.stack([x, y, z], axis=-1)


def woop_intersect(p0, p1, p2, o, d, t_max):
    """Watertight intersection of rays against triangles (broadcasted).

    p0/p1/p2, o, d: [..., 3] (already broadcast against each other);
    t_max: [...]. Returns (t, b0, b1, b2, valid) with barycentrics w.r.t.
    (p0, p1, p2). Mirrors triangle.rs:176-268.
    """
    # translate to ray-origin space (triangle.rs:190-197)
    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o

    # permute so the dominant ray axis is z (triangle.rs:199-205)
    kz = jnp.argmax(jnp.abs(d), axis=-1)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dt = _permute_axis(d, kx, ky, kz)
    p0t = _permute_axis(p0t, kx, ky, kz)
    p1t = _permute_axis(p1t, kx, ky, kz)
    p2t = _permute_axis(p2t, kx, ky, kz)

    # shear to align the ray with +z (triangle.rs:207-218); sz applied later
    inv_dz = 1.0 / dt[..., 2]
    sx = -dt[..., 0] * inv_dz
    sy = -dt[..., 1] * inv_dz
    sz = inv_dz
    x0 = p0t[..., 0] + sx * p0t[..., 2]
    y0 = p0t[..., 1] + sy * p0t[..., 2]
    x1 = p1t[..., 0] + sx * p1t[..., 2]
    y1 = p1t[..., 1] + sy * p1t[..., 2]
    x2 = p2t[..., 0] + sx * p2t[..., 2]
    y2 = p2t[..., 1] + sy * p2t[..., 2]

    # compensated edge functions (triangle.rs:219-231 + f64 fallback path)
    e0 = _diff_of_products(x1, y2, y1, x2)
    e1 = _diff_of_products(x2, y0, y2, x0)
    e2 = _diff_of_products(x0, y1, y0, x1)

    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2
    nondegen = det != 0.0

    z0 = sz * p0t[..., 2]
    z1 = sz * p1t[..., 2]
    z2 = sz * p2t[..., 2]
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    # sign-consistent range test (triangle.rs:239-251)
    neg = det < 0.0
    in_range = jnp.where(
        neg,
        (t_scaled <= 0.0) & (t_scaled > det * t_max),
        (t_scaled >= 0.0) & (t_scaled < det * t_max))

    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det

    # conservative t error bound (triangle.rs:253-268, pbrt 3.9.6)
    # maximum chains, not stack+reduce: a [N, 3] stack forces 128x-padded
    # [N, 1] producer buffers on TPU (round-5 profile)
    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0), jnp.abs(z1)), jnp.abs(z2))
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_z = gamma(3) * max_zt
    delta_x = gamma(5) * (max_xt + max_zt)
    delta_y = gamma(5) * (max_yt + max_zt)
    delta_e = 2.0 * (gamma(2) * max_xt * max_yt + delta_y * max_xt
                     + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = 3.0 * (gamma(3) * max_e * max_zt + delta_e * max_zt
                     + delta_z * max_e) * jnp.abs(inv_det)

    valid = same_sign & nondegen & in_range & (t > delta_t)
    return t, b0, b1, b2, valid


def woop_intersect_v3(p0: V3, p1: V3, p2: V3, o: V3, d: V3, t_max):
    """Component-SoA variant of woop_intersect for the per-lane one-face
    case (hit refinement): all inputs are flat-[N] V3s — zero tile padding
    (see core.vecmath.V3). Same math as woop_intersect / triangle.rs:176-268.
    """
    p0t, p1t, p2t = p0 - o, p1 - o, p2 - o

    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    kz0 = (ax >= ay) & (ax >= az)   # dominant axis x -> kz = 0
    kz1 = ~kz0 & (ay >= az)         # dominant axis y -> kz = 1

    def permute(v: V3) -> V3:
        # kz=0: (y,z,x); kz=1: (z,x,y); kz=2: (x,y,z)
        x = jnp.where(kz0, v.y, jnp.where(kz1, v.z, v.x))
        y = jnp.where(kz0, v.z, jnp.where(kz1, v.x, v.y))
        z = jnp.where(kz0, v.x, jnp.where(kz1, v.y, v.z))
        return V3(x, y, z)

    dt = permute(d)
    p0t, p1t, p2t = permute(p0t), permute(p1t), permute(p2t)

    inv_dz = 1.0 / dt.z
    sx = -dt.x * inv_dz
    sy = -dt.y * inv_dz
    sz = inv_dz
    x0 = p0t.x + sx * p0t.z
    y0 = p0t.y + sy * p0t.z
    x1 = p1t.x + sx * p1t.z
    y1 = p1t.y + sy * p1t.z
    x2 = p2t.x + sx * p2t.z
    y2 = p2t.y + sy * p2t.z

    e0 = _diff_of_products(x1, y2, y1, x2)
    e1 = _diff_of_products(x2, y0, y2, x0)
    e2 = _diff_of_products(x0, y1, y0, x1)

    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2
    nondegen = det != 0.0

    z0 = sz * p0t.z
    z1 = sz * p1t.z
    z2 = sz * p2t.z
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    neg = det < 0.0
    in_range = jnp.where(
        neg,
        (t_scaled <= 0.0) & (t_scaled > det * t_max),
        (t_scaled >= 0.0) & (t_scaled < det * t_max))

    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det

    m3 = lambda a, b, c: jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                                     jnp.abs(c))
    max_zt = m3(z0, z1, z2)
    max_xt = m3(x0, x1, x2)
    max_yt = m3(y0, y1, y2)
    delta_z = gamma(3) * max_zt
    delta_x = gamma(5) * (max_xt + max_zt)
    delta_y = gamma(5) * (max_yt + max_zt)
    delta_e = 2.0 * (gamma(2) * max_xt * max_yt + delta_y * max_xt
                     + delta_x * max_yt)
    max_e = m3(e0, e1, e2)
    delta_t = 3.0 * (gamma(3) * max_e * max_zt + delta_e * max_zt
                     + delta_z * max_e) * jnp.abs(inv_det)

    valid = same_sign & nondegen & in_range & (t > delta_t)
    return t, b0, b1, b2, valid


def _gather_verts(tris: Triangles, face_idx):
    i = tris.indices[face_idx]            # [..., 3]
    p = tris.positions[i]                 # [..., 3, 3]
    return p[..., 0, :], p[..., 1, :], p[..., 2, :]


def intersect_triangles(tris: Triangles, o, d, t_max, chunk: int = 1024):
    """Closest hit over the whole face table: (t, face_idx, valid) each [N].

    Chunked running-min sweep (brute force; the LBVH path supersedes this
    for large F). Padding faces are degenerate (index 0 repeated) and
    rejected by det != 0 only if face 0 is degenerate too — so padding uses
    an explicit validity mask instead.
    """
    f = tris.count
    if f == 0:
        n = o.shape[:-1]
        return (jnp.full(n, jnp.inf, Float), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, bool))
    n_chunks = -(-f // chunk)
    f_pad = n_chunks * chunk

    n = o.shape[:-1]

    def body(ci, carry):
        t_best, i_best, ok_best = carry
        base = ci * chunk
        fidx = base + jnp.arange(chunk)
        in_table = fidx < f
        fidx = jnp.minimum(fidx, f - 1)
        p0, p1, p2 = _gather_verts(tris, fidx)      # [C, 3]
        t, _, _, _, valid = woop_intersect(
            p0, p1, p2, o[..., None, :], d[..., None, :],
            t_best[..., None])
        valid = valid & in_table
        t = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        t_c = jnp.take_along_axis(t, j[..., None], -1)[..., 0]
        ok_c = jnp.take_along_axis(valid, j[..., None], -1)[..., 0]
        better = ok_c & (t_c < t_best)
        t_best = jnp.where(better, t_c, t_best)
        i_best = jnp.where(better, (base + j).astype(jnp.int32), i_best)
        ok_best = ok_best | better
        return t_best, i_best, ok_best

    init = (jnp.where(jnp.isfinite(t_max), t_max, jnp.inf),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))
    t_best, i_best, ok = jax.lax.fori_loop(0, n_chunks, body, init)
    return jnp.where(ok, t_best, jnp.inf), i_best, ok


def intersect_triangles_any(tris: Triangles, o, d, t_max,
                            chunk: int = 1024) -> jnp.ndarray:
    """Occlusion sweep (any-hit)."""
    f = tris.count
    if f == 0:
        return jnp.zeros(o.shape[:-1], bool)
    n_chunks = -(-f // chunk)

    def body(ci, blocked):
        base = ci * chunk
        fidx = base + jnp.arange(chunk)
        in_table = fidx < f
        fidx = jnp.minimum(fidx, f - 1)
        p0, p1, p2 = _gather_verts(tris, fidx)
        _, _, _, _, valid = woop_intersect(
            p0, p1, p2, o[..., None, :], d[..., None, :], t_max[..., None])
        return blocked | jnp.any(valid & in_table, axis=-1)

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros(o.shape[:-1], bool))


def build_tri_attr(tris: Triangles, tri_verts) -> jnp.ndarray:
    """Pack everything triangle_hit_info needs into a [F, 32] f32 row
    table: the per-ray fetch is then ONE row gather producing [N, 32].

    Why rows and not a transposed [27, F] (one flat gather per component):
    on TPU a gather's cost is dominated by the random-index count, not the
    bytes — slice-1 gathers run near scalar speed (~3 ms per [262k] gather
    measured through the whole stack), so 27 of them cost ~83 ms while one
    slice-32 row gather costs ~2 ms. The [N, 32] result tile-pads 4x in
    HBM (lanes 32→128) but that is ~1 ms of extra traffic — 40x cheaper
    than the scalar gathers.

    Column layout: 0:9 p0p1p2 | 9:18 n0n1n2 | 18:24 uv0uv1uv2
    | 24 mat_id(bits) | 25 light_id(bits) | 26 flags(has_normals | flip<<1)
    | 27:32 zero pad.
    """
    import numpy as np
    f = int(tris.count)
    v = np.asarray(tri_verts, np.float32).reshape(f, 9)
    idx = np.asarray(tris.indices)
    n_all = np.asarray(tris.normals)[idx].reshape(f, 9) \
        if np.asarray(tris.normals).size else np.zeros((f, 9), np.float32)
    uv_all = np.asarray(tris.uv)[idx].reshape(f, 6)
    # bake the default barycentric uvs (triangle.rs:~300) at build time
    uv_zero = np.all(uv_all == 0.0, axis=-1)
    uv_all[uv_zero] = np.asarray([0, 0, 1, 0, 1, 1], np.float32)
    out = np.zeros((f, 32), np.float32)
    out[:, 0:9] = v
    out[:, 9:18] = n_all
    out[:, 18:24] = uv_all
    # ids/flags stored as plain float VALUES (exact for |v| < 2^24), not
    # bitcasts: -1 bitcast to f32 is 0xFFFFFFFF = NaN, which TPU float
    # transport may canonicalize and which poisons NaN-debugging
    out[:, 24] = np.asarray(tris.mat_id, np.float32)
    out[:, 25] = np.asarray(tris.light_id, np.float32)
    flags = (np.asarray(tris.has_normals).astype(np.int32)
             | (np.asarray(tris.flip_normal).astype(np.int32) << 1))
    out[:, 26] = flags.astype(np.float32)
    return jnp.asarray(out)


def triangle_hit_info(tris: Triangles, face_idx, o: V3, d: V3, t, valid,
                      attr=None) -> Hit:
    """Full surface interaction for per-ray face `face_idx`
    (triangle.rs:270-393: barycentric p with error bounds, uv partials,
    interpolated shading frame). With `attr` (build_tri_attr, [27, F]) all
    per-face data comes from per-component row gathers; everything stays in
    flat-[N] component-SoA layout (core.vecmath.V3)."""
    if attr is not None:
        from fountain_tpu.core.gather import gather_cols
        # per-column FLAT gathers (no [N, 32] row block: its column
        # extracts force 128x-padded [N,1] producer buffers on TPU);
        # each accessed column is a pad-free [N] "rows" remat residual
        g = gather_cols(attr, face_idx)
        p0 = V3(g(0), g(1), g(2))
        p1 = V3(g(3), g(4), g(5))
        p2 = V3(g(6), g(7), g(8))
        n0 = V3(g(9), g(10), g(11))
        n1 = V3(g(12), g(13), g(14))
        n2 = V3(g(15), g(16), g(17))
        uv0 = (g(18), g(19))
        uv1 = (g(20), g(21))
        uv2 = (g(22), g(23))
        mat_id = g(24).astype(jnp.int32)
        light_id = g(25).astype(jnp.int32)
        flags = g(26).astype(jnp.int32)
        has_n = (flags & 1) != 0
        flip = (flags & 2) != 0
    else:
        from fountain_tpu.core.vecmath import v3_from
        p0a, p1a, p2a = _gather_verts(tris, face_idx)
        p0, p1, p2 = v3_from(p0a), v3_from(p1a), v3_from(p2a)
        i = tris.indices[face_idx]
        n_all = tris.normals[i]
        n0, n1, n2 = (v3_from(n_all[..., 0, :]), v3_from(n_all[..., 1, :]),
                      v3_from(n_all[..., 2, :]))
        uv_all = tris.uv[i]                    # [..., 3, 2]
        uv_zero = jnp.all(uv_all == 0.0, axis=(-1, -2))
        default_uv = jnp.broadcast_to(
            jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], Float),
            uv_all.shape)
        uv_all = jnp.where(uv_zero[..., None, None], default_uv, uv_all)
        uv0 = (uv_all[..., 0, 0], uv_all[..., 0, 1])
        uv1 = (uv_all[..., 1, 0], uv_all[..., 1, 1])
        uv2 = (uv_all[..., 2, 0], uv_all[..., 2, 1])
        mat_id = tris.mat_id[face_idx]
        light_id = tris.light_id[face_idx]
        has_n = tris.has_normals[face_idx]
        flip = tris.flip_normal[face_idx]

    tt, b0, b1, b2, _ = woop_intersect_v3(
        p0, p1, p2, o, d, jnp.where(valid, t * 1.0001 + 1e-5, jnp.inf))
    p = p0 * b0 + p1 * b1 + p2 * b2
    x_abs = (p0 * b0).abs() + (p1 * b1).abs() + (p2 * b2).abs()
    p_err = x_abs * gamma(7)

    u_hit = b0 * uv0[0] + b1 * uv1[0] + b2 * uv2[0]
    v_hit = b0 * uv0[1] + b1 * uv1[1] + b2 * uv2[1]

    # partial derivatives from the uv parameterization (triangle.rs:285-331)
    du02 = uv0[0] - uv2[0]
    dv02 = uv0[1] - uv2[1]
    du12 = uv1[0] - uv2[0]
    dv12 = uv1[1] - uv2[1]
    dp02 = p0 - p2
    dp12 = p1 - p2
    det_uv = du02 * dv12 - dv02 * du12
    degen_uv = jnp.abs(det_uv) < 1e-12
    inv_det = 1.0 / jnp.where(degen_uv, 1.0, det_uv)
    dpdu = (dp02 * dv12 - dp12 * dv02) * inv_det
    dpdv = (dp12 * du02 - dp02 * du12) * inv_det

    ng = normalize(cross(dp02, dp12))
    # fallback frame for degenerate uv
    _, fb_ss, fb_ts = coordinate_system(ng)
    dpdu = where3(degen_uv, fb_ss, dpdu)

    ng = where3(flip, -ng, ng)

    # interpolated shading normal (triangle.rs:332-391)
    ns_interp = normalize(n0 * b0 + n1 * b1 + n2 * b2)
    ns_interp = where3(flip, -ns_interp, ns_interp)
    degenerate_ns = length(ns_interp) < 0.5
    ns = where3(has_n & ~degenerate_ns, ns_interp, ng)
    # orient geometric normal to the shading-normal side (pbrt convention)
    ng = where3(dot(ng, ns) < 0.0, -ng, ng)

    # shading tangent from dpdu, re-orthogonalized against ns
    ss = normalize(dpdu - ns * dot(dpdu, ns))
    bad = length(ss) < 1e-6
    _, alt_ss, _ = coordinate_system(ns)
    ss = where3(bad, alt_ss, ss)
    ts = cross(ns, ss)

    wo = normalize(-d)
    inv_uv = jnp.maximum(1.0 / jnp.maximum(length(dpdu), 1e-12),
                         1.0 / jnp.maximum(length(dpdv), 1e-12))
    inv_uv = jnp.where(degen_uv, 0.0, inv_uv)
    return Hit(
        valid=valid, t=jnp.where(valid, t, jnp.inf), p=p, p_err=p_err,
        n=ng, ns=ns, ss=ss, ts=ts, u=u_hit, v=v_hit, wo=wo,
        prim_kind=jnp.where(valid, PRIM_TRIANGLE, PRIM_NONE).astype(jnp.int32),
        prim_id=face_idx.astype(jnp.int32),
        mat_id=jnp.where(valid, mat_id, -1).astype(jnp.int32),
        light_id=jnp.where(valid, light_id, -1).astype(jnp.int32),
        inv_uv_scale=inv_uv,
    )
