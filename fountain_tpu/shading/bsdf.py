"""BSDF evaluation/sampling over the wavefront: all five material models.

TPU-native analog of reference ``src/reflection/`` + ``src/material/``:

- The per-hit bump-arena lobe assembly (`Material::compute_scattering_
  functions`, material/mod.rs:17-25, matte.rs:35-53 …) becomes a stateless
  per-lane parameter gather (`gather_shading`) — textures evaluated at the
  hit uv, roughness remapped, nothing allocated.
- Trait-object lobes + Bsdf aggregator (bsdf.rs:26, up to 8 `&dyn BxDF`)
  become masked evaluate-all over the five *material* models (matte, mirror,
  glass, metal, plastic — loaders/pbrt.rs:323-345 is the closed set), each
  of which knows its own 1-2 lobes. Aggregator semantics match bsdf.rs:
  - f: sum lobes passing the geometric-normal reflect/transmit side test
    (bsdf.rs:67-82),
  - pdf: average over matching lobes (bsdf.rs:131-144),
  - sample_f: lobe chosen uniformly, then f/pdf recomputed over all lobes
    for non-specular picks (bsdf.rs:85-129).
- Local frame = (ss, ts, ns) from the hit record (bsdf.rs:31-46).

Everything flows in component-SoA V3 layout (three flat [N] arrays, zero
TPU tile padding — see core.vecmath.V3). Everything is differentiable
w.r.t. the texture-fed parameters (kd, ks, roughness, eta, k); sampled
directions are *choices* and get detached by the integrator
(detached-sampling gradient estimator).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fountain_tpu.core.gather import gather_rows3
from fountain_tpu.core.sampling import cosine_sample_hemisphere
from fountain_tpu.core.vecmath import (INV_PI, V3, dot, normalize, refract,
                                       where3)
from fountain_tpu.geometry.intersect import Hit
from fountain_tpu.scene.types import (MAT_GLASS, MAT_MATTE, MAT_METAL,
                                      MAT_MIRROR, MAT_PLASTIC, Scene)
from fountain_tpu.shading import microfacet as mf
from fountain_tpu.shading.fresnel import fresnel_conductor, fresnel_dielectric
from fountain_tpu.shading.textures import eval_texture


class ShadeParams(NamedTuple):
    """Per-lane shading parameters after texture evaluation."""
    mtype: jnp.ndarray   # [N] int32 (-1 = null bsdf)
    kd: V3
    ks: V3
    kr: V3
    kt: V3
    sigma: jnp.ndarray   # [N] Oren-Nayar sigma (degrees)
    eta: jnp.ndarray     # [N] dielectric ior
    eta3: V3             # conductor ior
    k3: V3               # conductor absorption
    alpha_u: jnp.ndarray  # [N] microfacet alpha (post-remap)
    alpha_v: jnp.ndarray  # [N]
    rough_raw: jnp.ndarray  # [N] pre-remap roughness (0 => smooth glass)


_SLOT0 = 12        # first texture-slot column
_SLOT_W = 12       # columns per texture slot
_N_SLOTS = 7       # kd ks kr kt sigma rough_u rough_v
_TABLE_W = _SLOT0 + _N_SLOTS * _SLOT_W   # 96


def _shading_table(scene: Scene) -> jnp.ndarray:
    """[M, 96] packed per-material shading row: material constants plus the
    depth-1 descriptor of each of its 7 texture slots inlined.

    WHY: a TPU gather costs ~3 ms per 262k random indices PER GATHER OP
    (latency-bound on the index stream, nearly independent of slice
    width), so the old formulation — 16 material-field gathers + 7
    eval_texture calls of ~30 gathers each — was ~200 gather ops per
    bounce. One 96-wide row gather replaces all of them for scenes of
    constant/uv/image textures; checker/scale graphs take a fallback
    (gated STATICALLY by Textures.has_nested's shape).

    Built in-jit from the live tables ([M]-indexed fetches are a few rows,
    negligible) so gradients flow from the packed rows back to
    ``textures.value`` through the one-hot-backward gather.

    Layout: 0 mtype | 1 eta | 2:5 eta3 | 5:8 k3 | 8 remap | 9:12 pad,
    then per slot s at 12+12s: 0 ttype | 1:4 value | 4:6 uv_scale |
    6:8 uv_offset | 8 image_id | 9 tid | 10:12 pad (int fields stored as
    float VALUES — exact for |v| < 2^24; a bitcast of -1 would be
    0xFFFFFFFF = NaN, which TPU float transport can canonicalize — and
    detached).
    """
    import jax
    m, tex = scene.materials, scene.textures
    sg = jax.lax.stop_gradient
    bi = lambda a: sg(a).astype(jnp.float32)
    zeros = jnp.zeros((m.count,), jnp.float32)

    def slot(tid_arr):
        t = jnp.clip(tid_arr, 0, max(tex.count - 1, 0))
        return [bi(tex.ttype[t]),
                tex.value[t, 0], tex.value[t, 1], tex.value[t, 2],
                sg(tex.uv_scale[t, 0]), sg(tex.uv_scale[t, 1]),
                sg(tex.uv_offset[t, 0]), sg(tex.uv_offset[t, 1]),
                bi(tex.image_id[t]), bi(t), zeros, zeros]

    cols = [bi(m.mtype), m.eta,
            m.eta3[:, 0], m.eta3[:, 1], m.eta3[:, 2],
            m.k3[:, 0], m.k3[:, 1], m.k3[:, 2],
            m.remap_roughness.astype(jnp.float32), zeros, zeros, zeros]
    for tid_arr in (m.kd_tex, m.ks_tex, m.kr_tex, m.kt_tex, m.sigma_tex,
                    m.rough_u_tex, m.rough_v_tex):
        cols += slot(tid_arr)
    return jnp.stack(cols, axis=1)


def gather_shading(scene: Scene, hit: Hit, tex_lookup=None,
                   tex_width=None) -> ShadeParams:
    """Evaluate the material table + textures at the hit points.

    Analog of Material::compute_scattering_functions dispatch
    (interaction.rs:111-121 → material/*.rs). ``tex_width`` [N] is the
    uv-space ray-cone footprint for mipmap filtering.

    ONE [N, 96] row gather of the packed shading table (see
    _shading_table) resolves all material constants and all simple
    (constant/uv/image) texture slots; only nested checker/scale graphs
    fall back to the generic eval_texture walk, and only in scenes that
    contain one (static has_nested gate).
    """
    import jax
    from fountain_tpu.core.gather import gather_rows
    from fountain_tpu.core.vecmath import zeros3
    from fountain_tpu.scene.types import (TEX_CHECKER, TEX_IMAGE, TEX_SCALE,
                                          TEX_UV)

    m = scene.materials
    tex = scene.textures
    mid = jnp.clip(hit.mat_id, 0, max(m.count - 1, 0))
    if tex_lookup is None and scene.env_images is not None:
        from fountain_tpu.shading.mipmap import lookup_trilinear
        atlas = scene.env_images
        tex_lookup = lambda iid, u, v, w=None: lookup_trilinear(
            atlas, iid, u, v, w)

    from fountain_tpu.core.gather import gather_cols
    # per-column flat accesses of the packed shading table — never
    # materializes [N, 96] rows (see core.gather.gather_cols)
    col = gather_cols(_shading_table(scene), mid)
    ib = lambda k: jax.lax.stop_gradient(col(k)).astype(jnp.int32)

    def eval_slot(s):
        off = _SLOT0 + _SLOT_W * s
        ttype = ib(off + 0)
        su, sv = col(off + 4), col(off + 5)
        du, dv = col(off + 6), col(off + 7)
        u = hit.u * su + du
        v = hit.v * sv + dv
        out = V3(col(off + 1), col(off + 2), col(off + 3))  # constant
        uv_rgb = V3(u - jnp.floor(u), v - jnp.floor(v), jnp.zeros_like(u))
        out = where3(ttype == TEX_UV, uv_rgb, out)
        if tex_lookup is not None:
            w = None if tex_width is None \
                else tex_width * jnp.maximum(su, sv)
            img = tex_lookup(ib(off + 8), u, v, w)
            out = where3(ttype == TEX_IMAGE, img, out)
        if tex.any_nested:
            nested = (ttype == TEX_CHECKER) | (ttype == TEX_SCALE)
            full = eval_texture(tex, ib(off + 9), hit.u, hit.v,
                                tex_lookup=tex_lookup, width=tex_width)
            out = where3(nested, full, out)
        return out

    kd = eval_slot(0)
    ks = eval_slot(1)
    kr = eval_slot(2)
    kt = eval_slot(3)
    sigma = eval_slot(4).x
    rough_u = eval_slot(5).x
    rough_v = eval_slot(6).x
    remap = col(8) > 0.5
    alpha_u = jnp.where(remap, mf.roughness_to_alpha(rough_u), rough_u)
    alpha_v = jnp.where(remap, mf.roughness_to_alpha(rough_v), rough_v)
    return ShadeParams(
        mtype=jnp.where(hit.mat_id >= 0, ib(0), -1).astype(jnp.int32),
        kd=kd, ks=ks, kr=kr, kt=kt, sigma=sigma,
        eta=col(1), eta3=V3(col(2), col(3), col(4)),
        k3=V3(col(5), col(6), col(7)),
        alpha_u=alpha_u, alpha_v=alpha_v,
        rough_raw=jnp.maximum(rough_u, rough_v))


# --- frame conversion (bsdf.rs:48-65) --------------------------------------


def world_to_local(hit: Hit, v: V3) -> V3:
    return V3(dot(v, hit.ss), dot(v, hit.ts), dot(v, hit.ns))


def local_to_world(hit: Hit, v: V3) -> V3:
    return hit.ss * v.x + hit.ts * v.y + hit.ns * v.z


# --- individual lobe models (local frame) ----------------------------------


def _lambert_f(kd: V3) -> V3:
    return kd * INV_PI


def _oren_nayar_f(kd: V3, sigma_deg, wo: V3, wi: V3) -> V3:
    """Oren-Nayar qualitative model (reference reflection/mod.rs:253-297)."""
    sigma = jnp.deg2rad(sigma_deg)
    s2 = sigma * sigma
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    # sqrt guarded away from 0: sqrt'(0)=inf leaks NaN cotangents into
    # masked lanes (this lobe is evaluated-all under where-selects)
    sin_ti = jnp.sqrt(jnp.maximum(mf.sin2_theta(wi), 1e-36))
    sin_to = jnp.sqrt(jnp.maximum(mf.sin2_theta(wo), 1e-36))
    # max(0, cos(phi_i - phi_o))
    cos_d_phi = (mf.cos_phi(wi) * mf.cos_phi(wo)
                 + mf.sin_phi(wi) * mf.sin_phi(wo))
    max_cos = jnp.where((sin_ti > 1e-4) & (sin_to > 1e-4),
                        jnp.maximum(0.0, cos_d_phi), 0.0)
    abs_ci = mf.abs_cos_theta(wi)
    abs_co = mf.abs_cos_theta(wo)
    sin_alpha = jnp.where(abs_ci > abs_co, sin_to, sin_ti)
    tan_beta = jnp.where(abs_ci > abs_co,
                         sin_ti / jnp.maximum(abs_ci, 1e-6),
                         sin_to / jnp.maximum(abs_co, 1e-6))
    return kd * (INV_PI * (a + b * max_cos * sin_alpha * tan_beta))


def _microfacet_reflection_f(ks: V3, fresnel_fn, wo: V3, wi: V3, ax, ay) -> V3:
    """Torrance-Sparrow (reference reflection/mod.rs:300-361).

    ``fresnel_fn(cos_i) -> V3``.
    """
    cos_o = mf.abs_cos_theta(wo)
    cos_i = mf.abs_cos_theta(wi)
    wh = wi + wo
    degen = (cos_i == 0.0) | (cos_o == 0.0) | (dot(wh, wh) == 0.0)
    wh = normalize(wh)
    # fresnel at wh (faceforward to +z side, reflection/mod.rs:330)
    f_term = fresnel_fn(dot(wi, where3(wh.z < 0, -wh, wh)))
    d = mf.tr_d(wh, ax, ay)
    g = mf.smith_g(mf.tr_lambda(wo, ax, ay), mf.tr_lambda(wi, ax, ay))
    val = ks * f_term * (d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-8))
    return where3(degen, 0.0, val)


def _microfacet_reflection_pdf(wo: V3, wi: V3, ax, ay):
    wh = normalize(wi + wo)
    same = mf.same_hemisphere(wo, wi)
    pdf_wh = mf.mf_pdf(mf.tr_d(wh, ax, ay), wh)
    pdf = pdf_wh / jnp.maximum(4.0 * dot(wo, wh), 1e-8)
    return jnp.where(same & (dot(wo, wh) > 0), pdf, 0.0)


def _microfacet_transmission_f(kt: V3, eta_a, eta_b, wo: V3, wi: V3,
                               ax, ay) -> V3:
    """Reference reflection/mod.rs:363-439 (pbrt rough transmission)."""
    same = mf.same_hemisphere(wo, wi)
    cos_o = mf.cos_theta(wo)
    cos_i = mf.cos_theta(wi)
    eta = jnp.where(cos_o > 0.0, eta_b / eta_a, eta_a / eta_b)
    wh = normalize(wo + wi * eta)
    wh = where3(wh.z < 0.0, -wh, wh)
    f_term = fresnel_dielectric(dot(wo, wh), eta_a, eta_b)
    sqrt_denom = dot(wo, wh) + eta * dot(wi, wh)
    d = mf.tr_d(wh, ax, ay)
    g = mf.smith_g(mf.tr_lambda(wo, ax, ay), mf.tr_lambda(wi, ax, ay))
    # transport mode Radiance => no eta^2 factor (pbrt-v3 convention)
    val = (d * g * jnp.abs(dot(wi, wh)) * jnp.abs(dot(wo, wh))
           / jnp.maximum(jnp.abs(cos_i * cos_o) * sqrt_denom ** 2, 1e-8))
    ok = (~same) & (cos_i != 0.0) & (cos_o != 0.0)
    return where3(ok, kt * ((1.0 - f_term) * val), 0.0)


def _microfacet_transmission_pdf(eta_a, eta_b, wo: V3, wi: V3, ax, ay):
    same = mf.same_hemisphere(wo, wi)
    cos_o = mf.cos_theta(wo)
    eta = jnp.where(cos_o > 0.0, eta_b / eta_a, eta_a / eta_b)
    wh = normalize(wo + wi * eta)
    sqrt_denom = dot(wo, wh) + eta * dot(wi, wh)
    dwh_dwi = jnp.abs((eta * eta * dot(wi, wh))
                      / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12))
    pdf_wh = mf.mf_pdf(mf.tr_d(where3(wh.z < 0, -wh, wh), ax, ay), wh)
    return jnp.where(same, 0.0, pdf_wh * dwh_dwi)


# --- per-material aggregate f / pdf / sample -------------------------------


class BsdfSample(NamedTuple):
    wi: V3                  # local frame
    f: V3
    pdf: jnp.ndarray        # [N]
    is_specular: jnp.ndarray  # [N] bool
    valid: jnp.ndarray      # [N] bool


def _matte_f_pdf(sp: ShadeParams, wo, wi):
    same = mf.same_hemisphere(wo, wi)
    f_lam = _lambert_f(sp.kd)
    f_on = _oren_nayar_f(sp.kd, sp.sigma, wo, wi)
    f = where3(sp.sigma == 0.0, f_lam, f_on)
    pdf = mf.abs_cos_theta(wi) * INV_PI
    return where3(same, f, 0.0), jnp.where(same, pdf, 0.0)


def _metal_f_pdf(sp: ShadeParams, wo, wi):
    one3 = V3(jnp.ones_like(sp.eta), jnp.ones_like(sp.eta),
              jnp.ones_like(sp.eta))
    fr = lambda ci: fresnel_conductor(ci, one3, sp.eta3, sp.k3)
    same = mf.same_hemisphere(wo, wi)
    f = _microfacet_reflection_f(one3, fr, wo, wi, sp.alpha_u, sp.alpha_v)
    pdf = _microfacet_reflection_pdf(wo, wi, sp.alpha_u, sp.alpha_v)
    return where3(same, f, 0.0), pdf


def _plastic_f_pdf(sp: ShadeParams, wo, wi):
    same = mf.same_hemisphere(wo, wi)

    def fr_d(ci):
        v = fresnel_dielectric(ci, 1.5, 1.0)
        return V3(v, v, v)
    f_spec = _microfacet_reflection_f(sp.ks, fr_d, wo, wi,
                                      sp.alpha_u, sp.alpha_u)
    f = _lambert_f(sp.kd) + f_spec
    pdf_l = mf.abs_cos_theta(wi) * INV_PI
    pdf_m = _microfacet_reflection_pdf(wo, wi, sp.alpha_u, sp.alpha_u)
    pdf = 0.5 * (pdf_l + pdf_m)
    return where3(same, f, 0.0), jnp.where(same, pdf, 0.0)


def _glass_rough_f_pdf(sp: ShadeParams, wo, wi):
    def fr(ci):
        v = fresnel_dielectric(ci, 1.0, sp.eta)
        return V3(v, v, v)
    f_r = _microfacet_reflection_f(sp.kr, fr, wo, wi, sp.alpha_u, sp.alpha_v)
    f_t = _microfacet_transmission_f(sp.kt, jnp.ones_like(sp.eta), sp.eta,
                                     wo, wi, sp.alpha_u, sp.alpha_v)
    same = mf.same_hemisphere(wo, wi)
    f = where3(same, f_r, f_t)
    pdf_r = _microfacet_reflection_pdf(wo, wi, sp.alpha_u, sp.alpha_v)
    pdf_t = _microfacet_transmission_pdf(jnp.ones_like(sp.eta), sp.eta,
                                         wo, wi, sp.alpha_u, sp.alpha_v)
    pdf = 0.5 * (pdf_r + pdf_t)
    return f, pdf


def bsdf_f_pdf(sp: ShadeParams, wo: V3, wi: V3):
    """Non-specular f and pdf for NEE/MIS (bsdf.rs:67-82, :131-144 with
    SPECULAR excluded — specular lobes contribute nothing here).

    wo/wi in local frame. Returns (f V3, pdf [N]).
    """
    zero = jnp.zeros_like(sp.eta)
    f, pdf = V3(zero, zero, zero), zero
    for mtype, fn in ((MAT_MATTE, _matte_f_pdf),
                      (MAT_METAL, _metal_f_pdf),
                      (MAT_PLASTIC, _plastic_f_pdf)):
        fi, pi = fn(sp, wo, wi)
        sel = sp.mtype == mtype
        f = where3(sel, fi, f)
        pdf = jnp.where(sel, pi, pdf)

    # glass: only the rough variant is non-specular
    fi, pi = _glass_rough_f_pdf(sp, wo, wi)
    sel = (sp.mtype == MAT_GLASS) & (sp.rough_raw > 0.0)
    f = where3(sel, fi, f)
    pdf = jnp.where(sel, pi, pdf)
    # mirror / smooth glass: f = 0, pdf = 0 (specular only)
    return f, pdf


def has_non_specular(sp: ShadeParams):
    """NEE gate (path.rs:60-63: num_components excluding SPECULAR > 0)."""
    return ((sp.mtype == MAT_MATTE) | (sp.mtype == MAT_METAL)
            | (sp.mtype == MAT_PLASTIC)
            | ((sp.mtype == MAT_GLASS) & (sp.rough_raw > 0.0)))


def bsdf_sample(sp: ShadeParams, wo: V3, u_lobe, u1, u2,
                detach_wi: bool = True) -> BsdfSample:
    """Sample a continuation direction (bsdf.rs:85-129 semantics).

    All candidate strategies are evaluated; the material type plus the
    uniform lobe pick select the result. Returns local-frame wi.

    ``detach_wi`` follows the integrator's detach_sampling flag (ADVICE
    r4): True (default) severs the sampled direction — the detached
    estimator; False keeps the u→wi reparameterization chain attached
    (tr_sample_wh's alpha→wh dependence included) for attached-mode
    gradients of sampled-lobe shape parameters like roughness.
    """
    # candidate A: cosine hemisphere on wo's side (DefaultSampleF,
    # reflection/mod.rs:116-147)
    wi_cos = cosine_sample_hemisphere(u1, u2)
    wi_cos = where3(wo.z < 0.0, V3(wi_cos.x, wi_cos.y, -wi_cos.z), wi_cos)

    # candidate B: GGX half-vector reflect
    wh = mf.tr_sample_wh(u1, u2, sp.alpha_u, sp.alpha_v)
    wh_f = where3(wo.z < 0.0, -wh, wh)  # wo side
    wi_mf = normalize(wh_f * (2.0 * dot(wo, wh_f)) - wo)

    # candidate C: perfect mirror
    wi_mirror = V3(-wo.x, -wo.y, wo.z)

    # candidate D: specular refraction about +z/-z
    entering = wo.z > 0.0
    eta_rel = jnp.where(entering, 1.0 / sp.eta, sp.eta)
    zer = jnp.zeros_like(wo.z)
    nloc = V3(zer, zer, jnp.where(entering, 1.0, -1.0))
    wi_refr, refr_ok = refract(wo, nloc, eta_rel)
    wi_refr = normalize(wi_refr)

    mtype = sp.mtype
    is_mirror = mtype == MAT_MIRROR
    is_metal = mtype == MAT_METAL
    is_plastic = mtype == MAT_PLASTIC
    is_glass = mtype == MAT_GLASS
    glass_rough = is_glass & (sp.rough_raw > 0.0)
    glass_smooth = is_glass & (sp.rough_raw == 0.0)
    pick_first = u_lobe < 0.5  # two-lobe materials: uniform lobe choice

    # --- select sampled wi per material
    wi = wi_cos  # matte
    wi = where3(is_mirror, wi_mirror, wi)
    wi = where3(is_metal, wi_mf, wi)
    wi = where3(is_plastic, where3(pick_first, wi_cos, wi_mf), wi)
    # smooth glass: reflect or refract; rough glass: mf reflect or mf refract
    wh_t = wh_f
    eta_t = jnp.where(mf.cos_theta(wo) > 0.0, 1.0 / sp.eta, sp.eta)
    wi_mft, mft_ok = refract(wo, where3(dot(wo, wh_t) < 0, -wh_t, wh_t),
                             eta_t)
    wi_mft = normalize(wi_mft)
    wi = where3(glass_smooth, where3(pick_first, wi_mirror, wi_refr), wi)
    wi = where3(glass_rough, where3(pick_first, wi_mf, wi_mft), wi)

    if detach_wi:
        # detached-sampling contract: the sampled DIRECTION carries no
        # gradient; parameter gradients flow only through f/pdf evaluated
        # AT the (fixed) direction (attached mode keeps the alpha->wh
        # chain; tr_sample_wh's phi map is pole-free for this)
        sg = jax.lax.stop_gradient
        wi = V3(sg(wi.x), sg(wi.y), sg(wi.z))

    # --- f, pdf, specular flag per material
    abs_ci = mf.abs_cos_theta(wi)
    safe_ci = jnp.maximum(abs_ci, 1e-8)

    # matte / metal / plastic / rough glass: non-specular aggregate at wi
    f_ns, pdf_ns = bsdf_f_pdf(sp, wo, wi)

    # mirror: F noop => kr / |cos|
    f_mirror = sp.kr * (1.0 / safe_ci)
    # smooth glass lobes
    fr_d = fresnel_dielectric(mf.cos_theta(wo), 1.0, sp.eta)
    f_g_refl = sp.kr * (fr_d / safe_ci)
    f_g_refr = sp.kt * ((1.0 - fr_d) / safe_ci)

    f = f_ns
    pdf = pdf_ns
    f = where3(is_mirror, f_mirror, f)
    pdf = jnp.where(is_mirror, 1.0, pdf)
    f = where3(glass_smooth, where3(pick_first, f_g_refl, f_g_refr), f)
    pdf = jnp.where(glass_smooth, 0.5, pdf)

    is_specular = is_mirror | glass_smooth
    valid = (sp.mtype >= 0) & (pdf > 0.0)
    # refraction validity for smooth glass transmit branch
    valid = valid & jnp.where(glass_smooth & ~pick_first, refr_ok, True)
    valid = valid & jnp.where(glass_rough & ~pick_first, mft_ok, True)
    return BsdfSample(wi=wi, f=f, pdf=pdf, is_specular=is_specular,
                      valid=valid)
