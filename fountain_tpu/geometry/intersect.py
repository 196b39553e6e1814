"""Batched ray-scene intersection: spheres (triangles live in triangle.py).

TPU-native analog of reference ``src/shapes/sphere.rs`` +
``src/interaction.rs`` + ``src/scene/mod.rs:51-64``:

- every ray in the wavefront is tested in parallel; per-primitive results are
  reduced with a masked argmin instead of sequential `t_max` shrinking
  (reference src/primitive.rs:48-54),
- the sphere quadratic uses the cancellation-free geometric rearrangement
  (discriminant = 4a(r-|v|)(r+|v|)) rather than EFloat interval arithmetic
  (reference sphere.rs:87-96) — same robustness goal, branch-free f32,
- hit points are reprojected onto the surface and carry error bounds
  (p_err = gamma(5)|p|, reference sphere.rs:114,180) that feed
  ``offset_ray_origin`` when spawning secondary rays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from fountain_tpu.core import transform as tf
from fountain_tpu.core.vecmath import (Float, PI, V3, cross, dot, gamma,
                                       length, normalize, offset_ray_origin,
                                       v3_from, vec, where3, zeros3)
from fountain_tpu.scene.types import Scene, Spheres

# Primitive kind codes in Hit.prim_kind
PRIM_NONE = 0
PRIM_SPHERE = 1
PRIM_TRIANGLE = 2


def _use_pallas() -> bool:
    """Trace-time backend dispatch: the VMEM-fused flash-intersect kernel
    (geometry.pallas_tri) only compiles on real TPU; CPU (tests, the
    virtual multi-chip dry run) uses the XLA tensor path."""
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


class Hit(NamedTuple):
    """SoA surface-interaction record (reference SurfaceInteraction,
    src/interaction.rs:60-84, flattened over the wavefront).

    All vectors are component-SoA ``V3`` (three flat [N] arrays) and uv is
    two flat [N] arrays — zero TPU tile padding (see core.vecmath.V3)."""
    valid: jnp.ndarray      # [N] bool
    t: jnp.ndarray          # [N]
    p: V3
    p_err: V3
    n: V3                   # geometric normal (orientation-flipped)
    ns: V3                  # shading normal
    ss: V3                  # shading tangent (normalized dpdu)
    ts: V3                  # shading bitangent
    u: jnp.ndarray          # [N]
    v: jnp.ndarray          # [N]
    wo: V3
    prim_kind: jnp.ndarray  # [N] int32
    prim_id: jnp.ndarray    # [N] int32
    mat_id: jnp.ndarray     # [N] int32 (-1 => null bsdf / pass-through)
    light_id: jnp.ndarray   # [N] int32 (-1 => not an emitter)
    # world-to-uv conversion for ray-cone texture filtering (the TPU analog
    # of reference compute_tex_differentials, interaction.rs:123-173):
    # uv footprint = cone width at the hit * inv_uv_scale
    inv_uv_scale: jnp.ndarray = None  # [N]


def spawn_ray(hit: Hit, d: V3) -> V3:
    """Robust secondary-ray origin (reference SurfaceHit::spawn_ray,
    src/interaction.rs:22-35)."""
    return offset_ray_origin(hit.p, hit.p_err, hit.n, d)


def _sphere_candidates(sph: Spheres, o_w: jnp.ndarray, d_w: jnp.ndarray,
                       t_max: jnp.ndarray):
    """All-pairs ray×sphere candidate t, shape [N, S]. Clipping included."""
    w2o = tf.Transform(sph.w2o, sph.o2w)
    # broadcast rays [N,1,3] against spheres [S,...]
    o = tf.transform_point(w2o, o_w[..., None, :])    # [N, S, 3]
    d = tf.transform_vector(w2o, d_w[..., None, :])   # [N, S, 3]

    a = dot(d, d)
    b = 2.0 * dot(o, d)
    c = dot(o, o) - sph.radius * sph.radius
    # geometric discriminant: v = o - (b/2a) d; disc = 4a(r-|v|)(r+|v|)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    v = o - (b / (2.0 * safe_a))[..., None] * d
    vlen = length(v)
    disc = 4.0 * a * (sph.radius - vlen) * (sph.radius + vlen)
    has_root = (disc >= 0.0) & (a > 0.0)
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / safe_a
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)

    def clip_ok(t):
        p = o + t[..., None] * d
        # reproject for robust clipping tests (sphere.rs:114)
        r = sph.radius
        p = p * (r / jnp.maximum(length(p), 1e-20))[..., None]
        z_ok = (p[..., 2] >= sph.z_min) & (p[..., 2] <= sph.z_max)
        phi = jnp.arctan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
        phi_ok = phi <= sph.phi_max + 1e-6
        return z_ok & phi_ok

    eps = 1e-3 * jnp.abs(tlo) + 1e-6  # conservative t>0 guard (EFloat analog)
    lo_ok = has_root & (tlo > eps) & (tlo < t_max[..., None]) & clip_ok(tlo)
    hi_ok = has_root & (thi > eps) & (thi < t_max[..., None]) & clip_ok(thi)
    t_hit = jnp.where(lo_ok, tlo, thi)
    ok = lo_ok | hi_ok
    return jnp.where(ok, t_hit, jnp.inf), ok


def intersect_spheres(sph: Spheres, o_w, d_w, t_max):
    """Closest hit over the sphere table: returns (t, index, valid), each [N]."""
    if sph.count == 0:
        n = o_w.shape[:-1]
        return (jnp.full(n, jnp.inf, Float), jnp.zeros(n, jnp.int32),
                jnp.zeros(n, bool))
    t_all, ok = _sphere_candidates(sph, o_w, d_w, t_max)
    idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(t_all, idx[..., None], axis=-1)[..., 0]
    valid = jnp.take_along_axis(ok, idx[..., None], axis=-1)[..., 0]
    return t, idx, valid


def intersect_spheres_any(sph: Spheres, o_w, d_w, t_max):
    """Any-hit (shadow) test: [N] bool (reference BVH::intersect_test
    early-out, bvh.rs:217-266 — here a plain reduction)."""
    if sph.count == 0:
        return jnp.zeros(o_w.shape[:-1], bool)
    _, ok = _sphere_candidates(sph, o_w, d_w, t_max)
    return jnp.any(ok, axis=-1)


def sphere_hit_info(sph: Spheres, idx: jnp.ndarray, o_w, d_w, t, valid):
    """Full surface interaction for per-ray chosen sphere `idx` (gathered).

    Mirrors reference sphere.rs:100-190: reprojection, phi/theta uv,
    analytic dpdu/dpdv, error bounds, world-space transform of the frame.
    """
    g = lambda a: a[idx]  # gather per-ray sphere params
    o2w = tf.Transform(g(sph.o2w), g(sph.w2o))
    w2o = o2w.inverse
    r = g(sph.radius)

    # miss lanes carry t = inf / t_max = -1; p = o + inf*d would be NaN,
    # and a NaN primal poisons reverse-mode cotangents of every op that
    # touches it even when the lane is masked downstream (0 * NaN = NaN)
    t = jnp.where(valid & jnp.isfinite(t), t, 0.0)
    o = tf.transform_point(w2o, o_w)
    d = tf.transform_vector(w2o, d_w)
    p = o + t[..., None] * d
    p = p * (r / jnp.maximum(length(p), 1e-20))[..., None]
    # avoid the phi singularity (sphere.rs:110-113 analog)
    px = jnp.where((p[..., 0] == 0.0) & (p[..., 1] == 0.0), 1e-5 * r, p[..., 0])
    p = p.at[..., 0].set(px)
    phi = jnp.arctan2(p[..., 1], p[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)

    z_min, z_max, phi_max = g(sph.z_min), g(sph.z_max), g(sph.phi_max)
    theta_min = jnp.arccos(jnp.clip(z_min / r, -1.0, 1.0))
    theta_max = jnp.arccos(jnp.clip(z_max / r, -1.0, 1.0))
    theta = jnp.arccos(jnp.clip(p[..., 2] / r, -1.0, 1.0))
    u = phi / phi_max
    v = (theta - theta_min) / jnp.where(theta_max == theta_min, 1.0,
                                        theta_max - theta_min)

    # analytic partials (sphere.rs:~120-160, PBRT 3.2)
    z_radius = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    inv_zr = 1.0 / jnp.maximum(z_radius, 1e-20)
    cos_phi = p[..., 0] * inv_zr
    sin_phi = p[..., 1] * inv_zr
    dpdu = vec(-phi_max * p[..., 1], phi_max * p[..., 0], jnp.zeros_like(phi))
    dpdv = (theta_max - theta_min)[..., None] * vec(
        p[..., 2] * cos_phi, p[..., 2] * sin_phi, -r * jnp.sin(theta))

    p_err_obj = gamma(5) * jnp.abs(p)
    p_w, p_err = tf.transform_point_with_input_error(o2w, p, p_err_obj)
    n_obj = normalize(p)
    n_w = normalize(tf.transform_normal(w2o.inverse, n_obj))
    flip = g(sph.flip_normal)
    n_w = jnp.where(flip[..., None], -n_w, n_w)
    dpdu_w = tf.transform_vector(o2w, dpdu)
    dpdv_w = tf.transform_vector(o2w, dpdv)

    ss = normalize(dpdu_w)
    ns = n_w
    ts = cross(ns, ss)
    # re-orthogonalize (degenerate dpdu at poles)
    bad = length(ts)[..., None] < 1e-8
    from fountain_tpu.core.vecmath import coordinate_system
    _, alt_ss, alt_ts = coordinate_system(ns)
    ss = jnp.where(bad, alt_ss, ss)
    ts = jnp.where(bad, alt_ts, normalize(ts))

    wo = normalize(-v3_from(d_w))
    inv_uv = jnp.maximum(1.0 / jnp.maximum(length(dpdu_w), 1e-12),
                         1.0 / jnp.maximum(length(dpdv_w), 1e-12))
    return Hit(
        valid=valid, t=t, p=v3_from(p_w), p_err=v3_from(p_err),
        n=v3_from(n_w), ns=v3_from(ns), ss=v3_from(ss), ts=v3_from(ts),
        u=u, v=v, wo=wo,
        prim_kind=jnp.where(valid, PRIM_SPHERE, PRIM_NONE).astype(jnp.int32),
        prim_id=idx.astype(jnp.int32),
        mat_id=jnp.where(valid, g(sph.mat_id), -1).astype(jnp.int32),
        light_id=jnp.where(valid, g(sph.light_id), -1).astype(jnp.int32),
        inv_uv_scale=inv_uv,
    )


def miss_hit(o: V3, d: V3) -> Hit:
    """All-invalid Hit wave (e.g. for sphere-less scenes)."""
    n = o.shape
    z = jnp.zeros(n, Float)
    one = jnp.ones(n, Float)
    zi = jnp.zeros(n, jnp.int32)
    return Hit(valid=jnp.zeros(n, bool), t=jnp.full(n, jnp.inf, Float),
               p=zeros3(n), p_err=zeros3(n),
               n=V3(z, z, one), ns=V3(z, z, one),
               ss=V3(one, z, z), ts=V3(z, one, z),
               u=z, v=z, wo=normalize(-d),
               prim_kind=zi, prim_id=zi, mat_id=zi - 1, light_id=zi - 1,
               inv_uv_scale=z)


def scene_intersect(scene: Scene, o_w, d_w, t_max, active=None,
                    sort: bool = True, presorted: bool = False) -> Hit:
    """Closest-hit over all primitive tables (reference Scene::intersect,
    src/scene/mod.rs:51-53). Currently spheres + triangles brute-force; BVH
    traversal replaces the triangle path once built (geometry.bvh).

    The raw (t, idx, valid) results are tagged as ``isect`` checkpoint
    residuals: under ``jax.checkpoint(policy=save_only_these_names("isect"))``
    the backward remat reuses them instead of re-running the intersection
    sweeps (they carry no gradient — already stop_gradient'd downstream).

    ``active`` (optional [N] bool): lanes that still need a result; lets the
    Pallas path sort dead lanes last and skip whole ray tiles.

    o_w/d_w are V3 (component SoA); array-based backends (sphere table,
    tensor/BVH fallbacks) convert at their boundary.
    """
    o_a = d_a = None  # lazy [N,3] conversion for array-based backends

    def arrays():
        nonlocal o_a, d_a
        if o_a is None:
            o_a, d_a = o_w.stack(), d_w.stack()
        return o_a, d_a

    if scene.spheres.count == 0:
        hit = miss_hit(o_w, d_w)
        ok_s = hit.valid
        t_s = hit.t
    else:
        oa, da = arrays()
        t_s, idx_s, ok_s = intersect_spheres(scene.spheres, oa, da, t_max)
        t_s = checkpoint_name(t_s, "isect")
        idx_s = checkpoint_name(idx_s, "isect")
        ok_s = checkpoint_name(ok_s, "isect")
        hit = sphere_hit_info(scene.spheres, idx_s, oa, da,
                              jnp.where(ok_s, t_s, t_max), ok_s)
    if scene.triangles.count > 0:
        from fountain_tpu.geometry.triangle import (intersect_triangles,
                                                    triangle_hit_info)
        cap = jnp.where(ok_s, t_s, t_max)
        if scene.tri_qfeat is not None and _use_pallas():
            from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
            t_t, idx_t, ok_t = mt_intersect_pallas(scene.tri_qfeat, o_w, d_w,
                                                   cap, active=active,
                                                   sort=sort,
                                                   presorted=presorted)
        elif scene.tri_features is not None:
            from fountain_tpu.geometry.tensor_tri import mt_intersect
            oa, da = arrays()
            t_t, idx_t, ok_t = mt_intersect(scene.tri_features, oa, da, cap)
        elif scene.bvh_meta is not None:
            from fountain_tpu.geometry.bvh import bvh_intersect
            oa, da = arrays()
            t_t, idx_t, ok_t = bvh_intersect(
                scene.triangles, scene.bvh_nodes_min, scene.bvh_nodes_max,
                scene.bvh_meta, oa, da, cap,
                nodes8=scene.bvh_nodes8, tri_verts=scene.bvh_tri_verts)
        else:
            oa, da = arrays()
            t_t, idx_t, ok_t = intersect_triangles(scene.triangles, oa, da,
                                                   cap)
        t_t = checkpoint_name(t_t, "isect")
        idx_t = checkpoint_name(idx_t, "isect")
        ok_t = checkpoint_name(ok_t, "isect")
        tri_hit = triangle_hit_info(scene.triangles, idx_t, o_w, d_w, t_t,
                                    ok_t, attr=scene.tri_attr)
        # triangle search was capped at the sphere hit distance, so any valid
        # triangle hit is closer than the sphere hit
        hit = select_hit(ok_t, tri_hit, hit)
    return hit


def select_hit(mask: jnp.ndarray, a: Hit, b: Hit) -> Hit:
    """Per-lane select between two Hit records (mask True -> a).

    Every leaf is a flat [N] array (V3 components included), so this is a
    plain tree of same-shape wheres."""
    import jax
    return jax.tree.map(lambda fa, fb: jnp.where(mask, fa, fb), a, b)


def scene_intersect_any(scene: Scene, o_w: V3, d_w: V3, t_max,
                        active=None, presorted: bool = False) -> jnp.ndarray:
    """Occlusion query (reference Scene::intersect_test, scene/mod.rs:55-57)."""
    o_a = d_a = None

    def arrays():
        nonlocal o_a, d_a
        if o_a is None:
            o_a, d_a = o_w.stack(), d_w.stack()
        return o_a, d_a

    if scene.spheres.count == 0:
        blocked = jnp.zeros(o_w.shape, bool)
    else:
        oa, da = arrays()
        blocked = intersect_spheres_any(scene.spheres, oa, da, t_max)
    if scene.triangles.count > 0:
        if scene.tri_qfeat is not None and _use_pallas():
            from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
            _, _, tri_blocked = mt_intersect_pallas(scene.tri_qfeat, o_w,
                                                    d_w, t_max, any_hit=True,
                                                    active=active,
                                                    presorted=presorted)
        elif scene.tri_features is not None:
            from fountain_tpu.geometry.tensor_tri import mt_intersect
            oa, da = arrays()
            _, _, tri_blocked = mt_intersect(scene.tri_features, oa, da,
                                             t_max, any_hit=True)
        elif scene.bvh_meta is not None:
            from fountain_tpu.geometry.bvh import bvh_intersect
            oa, da = arrays()
            _, _, tri_blocked = bvh_intersect(
                scene.triangles, scene.bvh_nodes_min, scene.bvh_nodes_max,
                scene.bvh_meta, oa, da, t_max, any_hit=True,
                nodes8=scene.bvh_nodes8, tri_verts=scene.bvh_tri_verts)
        else:
            from fountain_tpu.geometry.triangle import intersect_triangles_any
            oa, da = arrays()
            tri_blocked = intersect_triangles_any(scene.triangles, oa, da,
                                                  t_max)
        blocked = blocked | tri_blocked
    return checkpoint_name(blocked, "isect")
