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
evaluated masked and selected (lax-free, pure `where` dispatch — L is
small). All wavefront vectors are component-SoA V3 (flat [N] arrays, zero
TPU tile padding — see core.vecmath.V3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fountain_tpu.core import transform as tf
from fountain_tpu.core.gather import gather_rows3
from fountain_tpu.core.sampling import (pdf_env_alias, sample_env_alias,
                                        uniform_sample_sphere,
                                        uniform_sample_triangle)
from fountain_tpu.core.vecmath import (Float, PI, V3, cross, dot, gamma,
                                       length, normalize, v3_from, where3,
                                       zeros3)
from fountain_tpu.geometry.intersect import Hit
from fountain_tpu.scene.types import (LIGHT_AREA_SPHERE, LIGHT_AREA_TRI,
                                      LIGHT_DISTANT, LIGHT_INFINITE,
                                      LIGHT_POINT, Scene)

INV_2PI = 1.0 / (2.0 * PI)
INV_PI = 1.0 / PI


# --- env map direction <-> uv (single source of truth) ----------------------
# Equirect convention: theta from +z (zenith), phi from +x around z.
# v = 1 - theta/pi because images are stored bottom-row-first (io.image
# flip_y), so the top of the picture (v=1) is the zenith.


def dir_to_env_uv(d: V3):
    theta = jnp.arccos(jnp.clip(d.z, -1.0, 1.0))
    phi = jnp.arctan2(d.y, d.x)
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
    return phi * INV_2PI, 1.0 - theta * INV_PI


def env_uv_to_dir(u, v):
    theta = PI * (1.0 - v)
    phi = 2.0 * PI * u
    sin_t = jnp.sin(theta)
    return V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
              jnp.cos(theta)), sin_t


def _scene_tex_lookup(scene: Scene):
    if scene.env_images is None:
        return None
    from fountain_tpu.shading.mipmap import lookup_trilinear
    return lambda iid, u, v, w=None: lookup_trilinear(scene.env_images,
                                                      iid, u, v, w)


def _eval_env_tex(scene: Scene, tex_id, u, v) -> V3:
    """Evaluate an env radiance texture id at env uv (batched)."""
    from fountain_tpu.shading.textures import eval_texture
    return eval_texture(scene.textures, tex_id, u, v,
                        tex_lookup=_scene_tex_lookup(scene))


def _light_table(scene: Scene) -> jnp.ndarray:
    """[L, 16] packed per-light row (one row gather per sample/pdf query
    instead of ~12 scalar gathers; see bsdf._shading_table for the TPU
    gather cost model). Built in-jit so emit stays differentiable.

    Layout: 0 ltype | 1:4 emit | 4:7 pos | 7:10 dir | 10 shape_id |
    11 tri_start | 12 tri_count | 13 env_tex | 14 area | 15 env_slot
    (int fields stored as float VALUES — exact for |v| < 2^24; a bitcast
    of -1 would be 0xFFFFFFFF = NaN, which TPU float transport can
    canonicalize and which poisons NaN debugging — and detached)."""
    lt = scene.lights
    sg = jax.lax.stop_gradient
    bi = lambda a: sg(a).astype(jnp.float32)
    zeros = jnp.zeros((lt.count,), Float)
    slot = zeros - 1.0 if lt.env_slot is None else bi(lt.env_slot)
    cols = [bi(lt.ltype),
            lt.emit[:, 0], lt.emit[:, 1], lt.emit[:, 2],
            sg(lt.pos[:, 0]), sg(lt.pos[:, 1]), sg(lt.pos[:, 2]),
            sg(lt.dir[:, 0]), sg(lt.dir[:, 1]), sg(lt.dir[:, 2]),
            bi(lt.shape_id), bi(lt.tri_start), bi(lt.tri_count),
            bi(lt.env_tex), sg(lt.area), slot]
    return jnp.stack(cols, axis=1)


class _LightRows:
    """Decoded per-column view over the light table at per-lane indices
    (flat accesses only — see core.gather.gather_cols)."""

    def __init__(self, scene: Scene, li):
        from fountain_tpu.core.gather import gather_cols
        self._c = gather_cols(_light_table(scene), li)
        self._ib = lambda k: jax.lax.stop_gradient(
            self._c(k)).astype(jnp.int32)

    @property
    def ltype(self):
        return self._ib(0)

    @property
    def emit(self) -> V3:
        return V3(self._c(1), self._c(2), self._c(3))

    @property
    def pos(self) -> V3:
        # geometry columns are non-differentiable; detach so the gathered
        # row's tangent never reaches ray-offset ulp math (round-3 regression)
        sg = jax.lax.stop_gradient
        return V3(sg(self._c(4)), sg(self._c(5)), sg(self._c(6)))

    @property
    def dir(self) -> V3:
        sg = jax.lax.stop_gradient
        return V3(sg(self._c(7)), sg(self._c(8)), sg(self._c(9)))

    @property
    def shape_id(self):
        return self._ib(10)

    @property
    def tri_start(self):
        return self._ib(11)

    @property
    def tri_count(self):
        return self._ib(12)

    @property
    def env_tex(self):
        return self._ib(13)

    @property
    def area(self):
        return self._c(14)

    @property
    def env_slot(self):
        return self._ib(15)


class LightSample(NamedTuple):
    """Reference LiSample (light/mod.rs:51-60) in component SoA."""
    radiance: V3
    wi: V3                    # towards the light
    pdf: jnp.ndarray          # [N] solid-angle density
    p_light: V3               # visibility endpoint
    p_light_err: V3
    n_light: V3               # light surface normal (for offsetting)
    is_delta: jnp.ndarray     # [N] bool
    is_infinite: jnp.ndarray  # [N] bool (visibility ray is unbounded-ish)


def emitted_radiance(scene: Scene, hit: Hit) -> V3:
    """Area-light emission toward the viewer at surface hits
    (reference SurfaceInteraction::emitted_radiance interaction.rs:175-180 →
    DiffuseAreaLight::emitted_radiance diffuse.rs:44-50, one-sided)."""
    lid = jnp.clip(hit.light_id, 0, max(scene.lights.count - 1, 0))
    emit = _LightRows(scene, lid).emit
    visible = dot(hit.n, hit.wo) > 0.0
    on = (hit.light_id >= 0) & hit.valid & visible
    return where3(on, emit, 0.0)


def environment_radiance(scene: Scene, d: V3) -> V3:
    """Total radiance from infinite lights for escaped rays in direction d
    (reference Scene::environment_emitted_radiance scene/mod.rs:59-64 sums
    over all lights; InfiniteAreaLight::environment_emitted_radiance
    infinite.rs:156-164). Env-mapped lights evaluate their radiance texture
    at the equirect uv of d."""
    lt = scene.lights
    if lt.count == 0:
        return zeros3(d.shape)
    total = zeros3(d.shape)
    for i in range(lt.count):  # L is tiny & static; unrolled
        total = total + environment_light_radiance(scene, i, d)
    return total


def environment_light_radiance(scene: Scene, i: int, d: V3) -> V3:
    """Radiance of infinite light ``i`` alone for escaped rays in direction
    d (zero when light i is not infinite). Split out so the integrator can
    MIS-weight each env light against its own sampling pdf."""
    lt = scene.lights
    dn = normalize(d)
    u, v = dir_to_env_uv(dn)
    is_inf = lt.ltype[i] == LIGHT_INFINITE
    radiance = V3(jnp.broadcast_to(lt.emit[i, 0], d.shape),
                  jnp.broadcast_to(lt.emit[i, 1], d.shape),
                  jnp.broadcast_to(lt.emit[i, 2], d.shape))
    if scene.env_images is not None:
        has_env = lt.env_tex[i] >= 0
        tex_rgb = _eval_env_tex(
            scene, jnp.broadcast_to(lt.env_tex[i], u.shape), u, v)
        radiance = where3(has_env, radiance * tex_rgb, radiance)
    return where3(is_inf, radiance, 0.0)


def _sphere_surface_at(scene: Scene, sphere_idx, p_obj_unit: V3):
    """World position/normal/error for a unit-sphere point scaled to the
    sphere surface (reference Sphere::sample, sphere.rs:202-218).

    Array-layout internals (per-lane gathered 4x4 matrices); V3 at the
    boundary — the sphere path is cold on TPU scenes (mesh-dominated)."""
    sph = scene.spheres
    g = lambda a: a[sphere_idx]
    o2w = tf.Transform(g(sph.o2w), g(sph.w2o))
    r = g(sph.radius)
    p_unit = p_obj_unit.stack()
    p_obj = p_unit * r[..., None]
    p_err_obj = gamma(5) * jnp.abs(p_obj)
    p_w, p_err = tf.transform_point_with_input_error(o2w, p_obj, p_err_obj)
    n_w = normalize(tf.transform_normal(o2w, p_unit))
    n_w = jnp.where(g(sph.flip_normal)[..., None], -n_w, n_w)
    return v3_from(p_w), v3_from(p_err), v3_from(n_w)


def _sphere_area(scene: Scene, sphere_idx):
    # full-sphere area; clipped spheres as area lights are not supported yet
    r = scene.spheres.radius[sphere_idx]
    return 4.0 * PI * r * r


def sample_light(scene: Scene, light_idx: jnp.ndarray, ref_p: V3,
                 u1, u2) -> LightSample:
    """Sample incident illumination from per-lane light `light_idx`
    (reference Light::sample_incident_radiance implementations).

    Env-mapped infinite lights importance-sample scene.env_dist; plain
    infinite lights use uniform-sphere directions.
    """
    lt = scene.lights
    n = ref_p.shape
    li = jnp.clip(light_idx, 0, max(lt.count - 1, 0))
    lr = _LightRows(scene, li)
    ltype = lr.ltype
    emit = lr.emit

    wi = zeros3(n)
    pdf = jnp.zeros(n, Float)
    radiance = zeros3(n)
    p_light = zeros3(n)
    p_light_err = zeros3(n)
    n_light = zeros3(n)
    is_delta = (ltype == LIGHT_POINT) | (ltype == LIGHT_DISTANT)
    is_infinite = (ltype == LIGHT_INFINITE) | (ltype == LIGHT_DISTANT)

    # --- point light (point.rs:40-60): I / r^2, pdf = 1
    sel = ltype == LIGHT_POINT
    pos = lr.pos
    d_vec = pos - ref_p
    r2 = jnp.maximum(dot(d_vec, d_vec), 1e-12)
    wi = where3(sel, normalize(d_vec), wi)
    radiance = where3(sel, emit * (1.0 / r2), radiance)
    pdf = jnp.where(sel, 1.0, pdf)
    p_light = where3(sel, pos, p_light)

    # --- distant light (distant.rs:30-60): direction `dir` points FROM the
    # light; wi = -dir; endpoint outside scene bounds
    sel = ltype == LIGHT_DISTANT
    wi_d = normalize(-lr.dir)
    p_out = ref_p + wi_d * (2.0 * scene.world_radius)
    wi = where3(sel, wi_d, wi)
    radiance = where3(sel, emit, radiance)
    pdf = jnp.where(sel, 1.0, pdf)
    p_light = where3(sel, p_out, p_light)

    # --- infinite light (infinite.rs:42-61 uniform / :99-140 env-mapped):
    # endpoint at 2 * world radius (infinite.rs:121-129)
    sel = ltype == LIGHT_INFINITE
    wi_u = uniform_sample_sphere(u1, u2)
    pdf_u = jnp.full(n, 1.0 / (4.0 * PI), Float)
    rad_u = emit
    if scene.env_dist is not None:
        # importance-sample THIS light's luminance*sin(theta) density via
        # its O(1) texel alias table (per-light slot; the reference's 2D
        # CDF equivalent, infinite.rs:63-77,99-119; pdf /= 2 pi^2 sin)
        slot = jnp.maximum(lr.env_slot, 0)
        ue, ve, pdf_uv = sample_env_alias(scene.env_dist, slot, u1, u2)
        wi_e, sin_t = env_uv_to_dir(ue, ve)
        pdf_e = jnp.where(sin_t > 0.0,
                          pdf_uv / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-9)),
                          0.0)
        rad_e = emit * _eval_env_tex(scene, lr.env_tex, ue, ve)
        has_env = (lr.env_tex >= 0) & (lr.env_slot >= 0)
        wi_u = where3(has_env, wi_e, wi_u)
        pdf_u = jnp.where(has_env, pdf_e, pdf_u)
        rad_u = where3(has_env, rad_e, rad_u)
    elif scene.env_images is not None:
        # image-mapped env without a distribution: uniform dirs, textured L
        u_env, v_env = dir_to_env_uv(wi_u)
        rad_e = emit * _eval_env_tex(scene, lr.env_tex, u_env, v_env)
        has_env = lr.env_tex >= 0
        rad_u = where3(has_env, rad_e, rad_u)
    p_inf = ref_p + wi_u * (2.0 * scene.world_radius)
    wi = where3(sel, wi_u, wi)
    radiance = where3(sel, rad_u, radiance)
    pdf = jnp.where(sel, pdf_u, pdf)
    p_light = where3(sel, p_inf, p_light)

    # --- diffuse area light on a sphere (diffuse.rs:74-90 + sphere.rs:202):
    # uniform-area sample; pdf converted to solid angle via the *first
    # intersection* along wi (shapes/mod.rs:87-97 pdf_from_ref)
    sel = ltype == LIGHT_AREA_SPHERE
    if scene.spheres.count > 0:
        sphere_idx = jnp.clip(lr.shape_id, 0, scene.spheres.count - 1)
        p_unit = uniform_sample_sphere(u1, u2)
        p_s, p_s_err, n_s = _sphere_surface_at(scene, sphere_idx, p_unit)
        wi_s = normalize(p_s - ref_p)
        pdf_s = light_pdf(scene, li, ref_p, wi_s)
        # one-sided emission towards the reference (diffuse.rs:44-50)
        rad_s = where3(dot(n_s, -wi_s) > 0.0, emit, 0.0)
        degenerate = length(p_s - ref_p) < 1e-8
        wi = where3(sel, wi_s, wi)
        radiance = where3(sel & ~degenerate, rad_s,
                          where3(sel, 0.0, radiance))
        pdf = jnp.where(sel, jnp.where(degenerate, 0.0, pdf_s), pdf)
        p_light = where3(sel, p_s, p_light)
        p_light_err = where3(sel, p_s_err, p_light_err)
        n_light = where3(sel, n_s, n_light)

    # --- diffuse area light on a triangle mesh (diffuse.rs:74-90 +
    # Triangle::sample triangle.rs:395-420): face chosen ∝ area via a
    # per-light O(1) alias table, uniform barycentric point,
    # pdf = d²/(|cosθ|·totalArea). TWO [N, 16] row gathers of the packed
    # light_tri table (original face order — independent of the BVH leaf
    # reorder) replace the 21-gather CDF bisection + 7 vertex/flag gathers.
    sel = ltype == LIGHT_AREA_TRI
    if scene.triangles.count > 0 and scene.light_tri is not None:
        from fountain_tpu.core.gather import gather_cols
        start = lr.tri_start
        count = jnp.maximum(lr.tri_count, 1)
        f0 = u1 * count.astype(Float)
        k = jnp.clip(f0.astype(jnp.int32), 0, count - 1)
        frac = jnp.clip(f0 - k.astype(Float), 0.0, 1.0 - 1e-7)
        j0 = start + k
        # flat column accesses only (no [N, 16] row blocks): resolve the
        # alias decision first, then read the chosen face's row columns
        c0 = gather_cols(scene.light_tri, j0)
        prob = c0(0)
        take_alias = frac >= prob
        face = jnp.where(take_alias,
                         jax.lax.stop_gradient(c0(1)).astype(jnp.int32),
                         j0)
        rc = gather_cols(scene.light_tri, face)
        # remap the within-cell residual to a fresh uniform
        resid = jnp.where(
            take_alias,
            (frac - prob) / jnp.maximum(1.0 - prob, 1e-12),
            frac / jnp.maximum(prob, 1e-12))
        resid = jnp.clip(resid, 0.0, 1.0)
        p0 = V3(rc(2), rc(3), rc(4))
        p1 = V3(rc(5), rc(6), rc(7))
        p2 = V3(rc(8), rc(9), rc(10))
        flip_t = rc(11) > 0.5
        b0, b1 = uniform_sample_triangle(resid, u2)
        b2 = 1.0 - b0 - b1
        p_t = p0 * b0 + p1 * b1 + p2 * b2
        p_t_err = ((p0 * b0).abs() + (p1 * b1).abs()
                   + (p2 * b2).abs()) * gamma(6)
        n_t = normalize(cross(p1 - p0, p2 - p0))
        n_t = where3(flip_t, -n_t, n_t)
        d_t = p_t - ref_p
        d2 = jnp.maximum(dot(d_t, d_t), 1e-20)
        wi_t = d_t * (1.0 / jnp.sqrt(d2))
        cos_l = dot(n_t, -wi_t)
        area = jnp.maximum(lr.area, 1e-20)
        pdf_t = jnp.where(jnp.abs(cos_l) > 1e-8,
                          d2 / (jnp.abs(cos_l) * area), 0.0)
        rad_t = where3(cos_l > 0.0, emit, 0.0)
        degenerate = d2 < 1e-16
        wi = where3(sel, wi_t, wi)
        radiance = where3(sel & ~degenerate, rad_t,
                          where3(sel, 0.0, radiance))
        pdf = jnp.where(sel, jnp.where(degenerate, 0.0, pdf_t), pdf)
        p_light = where3(sel, p_t, p_light)
        p_light_err = where3(sel, p_t_err, p_light_err)
        n_light = where3(sel, n_t, n_light)

    return LightSample(radiance=radiance, wi=wi, pdf=pdf, p_light=p_light,
                       p_light_err=p_light_err, n_light=n_light,
                       is_delta=is_delta, is_infinite=is_infinite)


def light_pdf(scene: Scene, light_idx: jnp.ndarray, ref_p: V3,
              wi: V3, hit: Hit = None) -> jnp.ndarray:
    """Solid-angle pdf that `sample_light` would pick direction wi
    (reference Light::pdf_incident_radiance).

    Delta lights: 0. Uniform infinite: 1/4π (env-mapped: CDF pdf with the
    sin-θ Jacobian, infinite.rs:142-154). Area sphere: first-hit
    distance²/(|cosθ|·area) via analytic sphere intersection
    (shapes/mod.rs:87-97). Area mesh: needs the already-traced hit of the
    scene along wi (`hit`); 0 when absent.
    """
    lt = scene.lights
    n = ref_p.shape
    li = jnp.clip(light_idx, 0, max(lt.count - 1, 0))
    lr = _LightRows(scene, li)
    ltype = lr.ltype
    pdf = jnp.zeros(n, Float)

    sel = ltype == LIGHT_INFINITE
    pdf_inf = jnp.full(n, 1.0 / (4.0 * PI), Float)
    if scene.env_dist is not None:
        wn = normalize(wi)
        u_env, v_env = dir_to_env_uv(wn)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - wn.z ** 2, 0.0))
        slot = jnp.maximum(lr.env_slot, 0)
        pdf_uv = pdf_env_alias(scene.env_dist, slot, u_env, v_env)
        pdf_env = jnp.where(sin_t > 0.0,
                            pdf_uv / (2.0 * PI * PI
                                      * jnp.maximum(sin_t, 1e-9)), 0.0)
        has_env = (lr.env_tex >= 0) & (lr.env_slot >= 0)
        pdf_inf = jnp.where(has_env, pdf_env, pdf_inf)
    pdf = jnp.where(sel, pdf_inf, pdf)

    # --- mesh area light: convert from the traced hit (the MIS BSDF branch
    # always has one; the conversion d²/(|cosθ|·area) matches sample_light)
    if hit is not None:
        sel_t = ltype == LIGHT_AREA_TRI
        dh = ref_p - hit.p
        d2 = dot(dh, dh)
        same = hit.valid & (hit.light_id == li)
        cos_l = jnp.abs(dot(hit.n, -normalize(wi)))
        area = jnp.maximum(lr.area, 1e-20)
        pdf_t = jnp.where(same & (cos_l > 1e-8),
                          d2 / (cos_l * area), 0.0)
        pdf = jnp.where(sel_t, pdf_t, pdf)

    if scene.spheres.count > 0:
        sel = ltype == LIGHT_AREA_SPHERE
        sphere_idx = jnp.clip(lr.shape_id, 0, scene.spheres.count - 1)
        # intersect ONLY that sphere: gather a single-sphere table per lane
        # (array-layout internals; cold on mesh scenes)
        sph = scene.spheres
        one = type(sph)(*[a[sphere_idx][..., None] if a.ndim == 1
                          else a[sphere_idx][..., None, :, :] if a.ndim == 3
                          else a[sphere_idx][..., None] for a in sph])
        ref_a = ref_p.stack()
        wi_a = wi.stack()
        # offset origin slightly along wi to avoid self-hit when ref is ON
        # the light (mirrors spawn_ray + reference pdf_from_ref flow)
        o = ref_a + wi_a * 1e-3
        t_all, ok = _single_sphere_t(one, o, wi_a)
        p_hit = o + t_all[..., None] * wi_a
        n_obj = tf.transform_point(
            tf.Transform(one.w2o[..., 0, :, :], one.o2w[..., 0, :, :]), p_hit)
        n_w = normalize(tf.transform_normal(
            tf.Transform(one.o2w[..., 0, :, :], one.w2o[..., 0, :, :]),
            normalize(n_obj)))
        n_w = jnp.where(one.flip_normal[..., 0][..., None], -n_w, n_w)
        area = _sphere_area(scene, sphere_idx)
        dd = ref_a - p_hit
        d2 = jnp.sum(dd * dd, axis=-1)
        denom = jnp.abs(jnp.sum(n_w * -wi_a, axis=-1)) * area
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
