"""Light emission, sampling, and pdf queries over the light table.

TPU-native analog of reference ``src/light/``:
- ``DiffuseAreaLight`` one-sided emission (diffuse.rs:44-50) and
  sphere-shape sampling with solid-angle pdf conversion
  (shapes/mod.rs:55-66 pdf_from_ref, sphere.rs:202-218 area sample),
- ``PointLight`` delta position with 1/r² falloff (point.rs:56),
- ``DistantLight`` delta direction offset past the scene bounds
  (distant.rs:52),
- ``InfiniteAreaLight`` uniform-color variant (infinite.rs:42-61); the
  env-map importance-sampled variant plugs in via the texture/mipmap layer.

Batched: every lane carries its own chosen light index; all light types are
evaluated masked and selected (lax-free, pure `where` dispatch — L is small).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fountain_tpu.core import transform as tf
from fountain_tpu.core.sampling import uniform_sample_sphere
from fountain_tpu.core.vecmath import (Float, PI, distance_sq, dot, gamma,
                                       length, normalize)
from fountain_tpu.geometry.intersect import Hit
from fountain_tpu.scene.types import (LIGHT_AREA_SPHERE, LIGHT_AREA_TRI,
                                      LIGHT_DISTANT, LIGHT_INFINITE,
                                      LIGHT_POINT, Scene)


class LightSample(NamedTuple):
    """Reference LiSample (light/mod.rs:51-60) in SoA."""
    radiance: jnp.ndarray   # [N, 3]
    wi: jnp.ndarray         # [N, 3] towards the light
    pdf: jnp.ndarray        # [N] solid-angle density
    p_light: jnp.ndarray    # [N, 3] visibility endpoint
    p_light_err: jnp.ndarray  # [N, 3]
    n_light: jnp.ndarray    # [N, 3] light surface normal (for offsetting)
    is_delta: jnp.ndarray   # [N] bool
    is_infinite: jnp.ndarray  # [N] bool (visibility ray is unbounded-ish)


def emitted_radiance(scene: Scene, hit: Hit) -> jnp.ndarray:
    """Area-light emission toward the viewer at surface hits
    (reference SurfaceInteraction::emitted_radiance interaction.rs:175-180 →
    DiffuseAreaLight::emitted_radiance diffuse.rs:44-50, one-sided)."""
    lid = jnp.clip(hit.light_id, 0, max(scene.lights.count - 1, 0))
    emit = scene.lights.emit[lid]
    visible = dot(hit.n, hit.wo) > 0.0
    on = (hit.light_id >= 0) & hit.valid & visible
    return jnp.where(on[..., None], emit, 0.0)


def environment_radiance(scene: Scene, d: jnp.ndarray,
                         env_lookup=None) -> jnp.ndarray:
    """Total radiance from infinite lights for escaped rays in direction d
    (reference Scene::environment_emitted_radiance scene/mod.rs:59-64 sums
    over all lights; InfiniteAreaLight::environment_emitted_radiance
    infinite.rs:156-164)."""
    lt = scene.lights
    if lt.count == 0:
        return jnp.zeros(d.shape[:-1] + (3,), Float)
    total = jnp.zeros(d.shape[:-1] + (3,), Float)
    for i in range(lt.count):  # L is tiny & static; unrolled
        is_inf = lt.ltype[i] == LIGHT_INFINITE
        radiance = lt.emit[i]
        if env_lookup is not None:
            radiance = radiance * env_lookup(i, d)
        total = total + jnp.where(is_inf, radiance, 0.0)
    return total


def _sphere_surface_at(scene: Scene, sphere_idx, p_obj_unit):
    """World position/normal/error for a unit-sphere point scaled to the
    sphere surface (reference Sphere::sample, sphere.rs:202-218)."""
    sph = scene.spheres
    g = lambda a: a[sphere_idx]
    o2w = tf.Transform(g(sph.o2w), g(sph.w2o))
    r = g(sph.radius)
    p_obj = p_obj_unit * r[..., None]
    p_err_obj = gamma(5) * jnp.abs(p_obj)
    p_w, p_err = tf.transform_point_with_input_error(o2w, p_obj, p_err_obj)
    n_w = normalize(tf.transform_normal(o2w, p_obj_unit))
    n_w = jnp.where(g(sph.flip_normal)[..., None], -n_w, n_w)
    return p_w, p_err, n_w


def _sphere_area(scene: Scene, sphere_idx):
    # full-sphere area; clipped spheres as area lights are not supported yet
    r = scene.spheres.radius[sphere_idx]
    return 4.0 * PI * r * r


def sample_light(scene: Scene, light_idx: jnp.ndarray, ref_p: jnp.ndarray,
                 u1, u2, env_sample=None) -> LightSample:
    """Sample incident illumination from per-lane light `light_idx`
    (reference Light::sample_incident_radiance implementations).

    `env_sample(light_idx, u1, u2) -> (wi, pdf, radiance)` hook is provided
    by the env-map layer for importance-sampled infinite lights; without it
    infinite lights use uniform-sphere directions.
    """
    lt = scene.lights
    n = ref_p.shape[:-1]
    li = jnp.clip(light_idx, 0, max(lt.count - 1, 0))
    ltype = lt.ltype[li]
    emit = lt.emit[li]

    zero3 = jnp.zeros(n + (3,), Float)
    wi = zero3
    pdf = jnp.zeros(n, Float)
    radiance = zero3
    p_light = zero3
    p_light_err = zero3
    n_light = zero3
    is_delta = (ltype == LIGHT_POINT) | (ltype == LIGHT_DISTANT)
    is_infinite = (ltype == LIGHT_INFINITE) | (ltype == LIGHT_DISTANT)

    # --- point light (point.rs:40-60): I / r^2, pdf = 1
    sel = ltype == LIGHT_POINT
    d_vec = lt.pos[li] - ref_p
    r2 = jnp.maximum(distance_sq(lt.pos[li], ref_p), 1e-12)
    wi = jnp.where(sel[..., None], normalize(d_vec), wi)
    radiance = jnp.where(sel[..., None], emit / r2[..., None], radiance)
    pdf = jnp.where(sel, 1.0, pdf)
    p_light = jnp.where(sel[..., None], lt.pos[li], p_light)

    # --- distant light (distant.rs:30-60): direction `dir` points FROM the
    # light; wi = -dir; endpoint outside scene bounds
    sel = ltype == LIGHT_DISTANT
    wi_d = normalize(-lt.dir[li])
    p_out = ref_p + wi_d * (2.0 * scene.world_radius)
    wi = jnp.where(sel[..., None], wi_d, wi)
    radiance = jnp.where(sel[..., None], emit, radiance)
    pdf = jnp.where(sel, 1.0, pdf)
    p_light = jnp.where(sel[..., None], p_out, p_light)

    # --- infinite light, uniform variant (infinite.rs:42-61): uniform
    # direction; endpoint at 2 * world radius (infinite.rs:121-129)
    sel = ltype == LIGHT_INFINITE
    wi_u = uniform_sample_sphere(u1, u2)
    pdf_u = jnp.full(n, 1.0 / (4.0 * PI), Float)
    rad_u = jnp.broadcast_to(emit, n + (3,))
    if env_sample is not None:
        wi_e, pdf_e, rad_e = env_sample(li, u1, u2)
        has_env = lt.env_tex[li] >= 0
        wi_u = jnp.where(has_env[..., None], wi_e, wi_u)
        pdf_u = jnp.where(has_env, pdf_e, pdf_u)
        rad_u = jnp.where(has_env[..., None], rad_e, rad_u)
    p_inf = ref_p + wi_u * (2.0 * scene.world_radius)
    wi = jnp.where(sel[..., None], wi_u, wi)
    radiance = jnp.where(sel[..., None], rad_u, radiance)
    pdf = jnp.where(sel, pdf_u, pdf)
    p_light = jnp.where(sel[..., None], p_inf, p_light)

    # --- diffuse area light on a sphere (diffuse.rs:74-90 + sphere.rs:202):
    # uniform-area sample; pdf converted to solid angle via the *first
    # intersection* along wi (shapes/mod.rs:87-97 pdf_from_ref)
    sel = ltype == LIGHT_AREA_SPHERE
    if scene.spheres.count > 0:
        sphere_idx = jnp.clip(lt.shape_id[li], 0, scene.spheres.count - 1)
        p_unit = uniform_sample_sphere(u1, u2)
        p_s, p_s_err, n_s = _sphere_surface_at(scene, sphere_idx, p_unit)
        wi_s = normalize(p_s - ref_p)
        pdf_s = light_pdf(scene, li, ref_p, wi_s)
        # one-sided emission towards the reference (diffuse.rs:44-50)
        rad_s = jnp.where((dot(n_s, -wi_s) > 0.0)[..., None], emit, 0.0)
        degenerate = length(p_s - ref_p) < 1e-8
        wi = jnp.where(sel[..., None], wi_s, wi)
        radiance = jnp.where((sel & ~degenerate)[..., None], rad_s,
                             jnp.where(sel[..., None], 0.0, radiance))
        pdf = jnp.where(sel, jnp.where(degenerate, 0.0, pdf_s), pdf)
        p_light = jnp.where(sel[..., None], p_s, p_light)
        p_light_err = jnp.where(sel[..., None], p_s_err, p_light_err)
        n_light = jnp.where(sel[..., None], n_s, n_light)

    return LightSample(radiance=radiance, wi=wi, pdf=pdf, p_light=p_light,
                       p_light_err=p_light_err, n_light=n_light,
                       is_delta=is_delta, is_infinite=is_infinite)


def light_pdf(scene: Scene, light_idx: jnp.ndarray, ref_p: jnp.ndarray,
              wi: jnp.ndarray, env_pdf=None) -> jnp.ndarray:
    """Solid-angle pdf that `sample_light` would pick direction wi
    (reference Light::pdf_incident_radiance).

    Delta lights: 0. Uniform infinite: 1/4π. Area sphere: first-hit
    distance²/(|cosθ|·area) via analytic sphere intersection
    (shapes/mod.rs:87-97).
    """
    lt = scene.lights
    n = ref_p.shape[:-1]
    li = jnp.clip(light_idx, 0, max(lt.count - 1, 0))
    ltype = lt.ltype[li]
    pdf = jnp.zeros(n, Float)

    sel = ltype == LIGHT_INFINITE
    pdf_inf = jnp.full(n, 1.0 / (4.0 * PI), Float)
    if env_pdf is not None:
        has_env = lt.env_tex[li] >= 0
        pdf_inf = jnp.where(has_env, env_pdf(li, wi), pdf_inf)
    pdf = jnp.where(sel, pdf_inf, pdf)

    if scene.spheres.count > 0:
        from fountain_tpu.geometry.intersect import (intersect_spheres,
                                                     sphere_hit_info)
        sel = ltype == LIGHT_AREA_SPHERE
        sphere_idx = jnp.clip(lt.shape_id[li], 0, scene.spheres.count - 1)
        # intersect ONLY that sphere: gather a single-sphere table per lane
        sph = scene.spheres
        one = type(sph)(*[a[sphere_idx][..., None] if a.ndim == 1
                          else a[sphere_idx][..., None, :, :] if a.ndim == 3
                          else a[sphere_idx][..., None] for a in sph])
        # offset origin slightly along wi to avoid self-hit when ref is ON
        # the light (mirrors spawn_ray + reference pdf_from_ref flow)
        o = ref_p + wi * 1e-3
        t_all, ok = _single_sphere_t(one, o, wi)
        p_hit = o + t_all[..., None] * wi
        n_obj = tf.transform_point(
            tf.Transform(one.w2o[..., 0, :, :], one.o2w[..., 0, :, :]), p_hit)
        n_w = normalize(tf.transform_normal(
            tf.Transform(one.o2w[..., 0, :, :], one.w2o[..., 0, :, :]),
            normalize(n_obj)))
        n_w = jnp.where(one.flip_normal[..., 0][..., None], -n_w, n_w)
        area = _sphere_area(scene, sphere_idx)
        d2 = distance_sq(ref_p, p_hit)
        denom = jnp.abs(dot(n_w, -wi)) * area
        pdf_area = jnp.where(ok & (denom > 0.0),
                             d2 / jnp.maximum(denom, 1e-12), 0.0)
        pdf = jnp.where(sel, pdf_area, pdf)
    return pdf


def _single_sphere_t(one, o, d):
    """First positive t for per-lane single-sphere tables (helper for
    light_pdf); shapes [N]."""
    from fountain_tpu.geometry.intersect import _sphere_candidates
    t_max = jnp.full(o.shape[:-1], jnp.inf, Float)
    t_all, ok = _sphere_candidates(one, o, d, t_max)
    return t_all[..., 0], ok[..., 0]
