"""Microfacet distributions: Trowbridge-Reitz (GGX) and Beckmann.

TPU-native analog of reference ``src/reflection/microfacet.rs``:
- D / Smith Λ / G / full-distribution sample_wh for both models
  (Beckmann :34-116, TrowbridgeReitz :119-187),
- ``roughness_to_alpha`` remap (:40-45).

All functions are in the local shading frame (z = shading normal) over
batched arrays. Like the reference, sampling is over the *full* NDF (the
visible-NDF variant was a TODO in the reference, microfacet.rs:29,85,163);
pdf = D(wh)·|cos θh|.
"""
from __future__ import annotations

import jax.numpy as jnp

from fountain_tpu.core.vecmath import PI, V3, vec

# local-frame trig helpers (reference reflection/mod.rs helpers)


def cos_theta(w):
    return w.z


def cos2_theta(w):
    return w.z * w.z


def abs_cos_theta(w):
    return jnp.abs(w.z)


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-20)


def cos_phi(w):
    # sqrt guarded away from 0: sqrt'(0) = inf would leak 0*inf = NaN into
    # cotangents of masked lanes (all these helpers are evaluated-all-lobes
    # under where-selects, so they must be NaN-free in fwd AND bwd)
    s = jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-36))
    return jnp.where(sin2_theta(w) == 0.0, 1.0,
                     jnp.clip(w.x / s, -1.0, 1.0))


def sin_phi(w):
    s = jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-36))
    return jnp.where(sin2_theta(w) == 0.0, 0.0,
                     jnp.clip(w.y / s, -1.0, 1.0))


def same_hemisphere(a, b):
    return a.z * b.z > 0.0


def roughness_to_alpha(roughness):
    """PBRT heuristic remap (reference microfacet.rs:40-45)."""
    r = jnp.maximum(roughness, 1e-3)
    x = jnp.log(r)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


# --- Trowbridge-Reitz (GGX), reference microfacet.rs:119-187 ---------------


def tr_d(wh, ax, ay):
    """GGX NDF. Every intermediate is clamped finite so reverse-mode stays
    NaN-free on masked/degenerate lanes (the masked-where 0*inf trap:
    a where() guards the primal but the cotangent of an inf intermediate
    is NaN even with zero incoming cotangent)."""
    c2 = cos2_theta(wh)
    ok = c2 > 1e-10
    c2s = jnp.where(ok, c2, 1.0)
    t2 = sin2_theta(wh) / c2s
    e = jnp.minimum((cos_phi(wh) ** 2 / jnp.maximum(ax * ax, 1e-20)
                     + sin_phi(wh) ** 2 / jnp.maximum(ay * ay, 1e-20)) * t2,
                    1e16)
    d = 1.0 / jnp.maximum(
        PI * jnp.maximum(ax * ay, 1e-20) * c2s * c2s * (1.0 + e) ** 2,
        1e-30)
    return jnp.where(ok, d, 0.0)


def tr_lambda(w, ax, ay):
    c2 = cos2_theta(w)
    ok = c2 > 1e-10
    t2 = sin2_theta(w) / jnp.where(ok, c2, 1.0)
    alpha2 = cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay
    a2t2 = jnp.minimum(alpha2 * t2, 1e30)
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(ok, lam, 0.0)


def tr_sample_wh(u1, u2, ax, ay):
    """Full-NDF GGX half-vector sampling (microfacet.rs:162-186), including
    the anisotropic phi branch."""
    iso = ax == ay
    # isotropic
    phi_i = (2.0 * PI) * u2
    # anisotropic: the reference's arctan(ay/ax·tan(2πu+π/2)) quadrant
    # formula (microfacet.rs:168-171) has tan poles whose cotangents NaN
    # the backward pass (the attached-sampling estimator differentiates
    # through this map). The ellipse parameterization
    # phi = atan2(ay·sin t, ax·cos t), t = 2πu, draws the SAME marginal
    # p(φ) ∝ 1/(cos²φ/ax² + sin²φ/ay²) — pole-free, and sin/cos of φ come
    # straight from normalizing (ax·cos t, ay·sin t)
    t = 2.0 * PI * u2
    cx = jnp.maximum(ax, 1e-20) * jnp.cos(t)
    sy = jnp.maximum(ay, 1e-20) * jnp.sin(t)
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(cx * cx + sy * sy, 1e-40))
    cp = cx * inv_n
    sp = sy * inv_n
    alpha2 = 1.0 / jnp.maximum(cp * cp / jnp.maximum(ax * ax, 1e-20)
                               + sp * sp / jnp.maximum(ay * ay, 1e-20), 1e-20)
    tan2_i = ax * ax * u1 / jnp.maximum(1.0 - u1, 1e-9)
    tan2_a = alpha2 * u1 / jnp.maximum(1.0 - u1, 1e-9)

    cos_phi_v = jnp.where(iso, jnp.cos(phi_i), cp)
    sin_phi_v = jnp.where(iso, jnp.sin(phi_i), sp)
    tan2 = jnp.where(iso, tan2_i, tan2_a)
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(sin_t * cos_phi_v, sin_t * sin_phi_v, cos_t)


# --- Beckmann, reference microfacet.rs:34-116 ------------------------------


def beckmann_d(wh, ax, ay):
    c2 = cos2_theta(wh)
    ok = c2 > 1e-10
    c2s = jnp.where(ok, c2, 1.0)
    t2 = sin2_theta(wh) / c2s
    expo = jnp.minimum(
        t2 * (cos_phi(wh) ** 2 / jnp.maximum(ax * ax, 1e-20)
              + sin_phi(wh) ** 2 / jnp.maximum(ay * ay, 1e-20)), 88.0)
    d = jnp.exp(-expo) / jnp.maximum(
        PI * jnp.maximum(ax * ay, 1e-20) * c2s * c2s, 1e-30)
    return jnp.where(ok, d, 0.0)


def beckmann_lambda(w, ax, ay):
    c2 = cos2_theta(w)
    ok = c2 > 1e-10
    t2 = sin2_theta(w) / jnp.where(ok, c2, 1.0)
    abs_tan = jnp.sqrt(jnp.maximum(t2, 1e-36))
    alpha = jnp.sqrt(jnp.maximum(
        cos_phi(w) ** 2 * ax * ax + sin_phi(w) ** 2 * ay * ay, 1e-36))
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-20)
    lam = jnp.where(
        a >= 1.6, 0.0,
        (1.0 - 1.259 * a + 0.396 * a * a)
        / jnp.maximum(3.535 * a + 2.181 * a * a, 1e-20))
    return jnp.where(ok, lam, 0.0)


def beckmann_sample_wh(u1, u2, ax, ay):
    """Full-NDF Beckmann sampling (isotropic + anisotropic log-space form,
    microfacet.rs:85-114)."""
    iso = ax == ay
    log_u = jnp.log(jnp.maximum(1.0 - u1, 1e-9))
    tan2_i = -ax * ax * log_u
    phi_i = u2 * 2.0 * PI

    phi_a = jnp.arctan(ay / jnp.maximum(ax, 1e-20)
                       * jnp.tan(2.0 * PI * u2 + 0.5 * PI))
    phi_a = jnp.where(u2 > 0.5, phi_a + PI, phi_a)
    sp, cp = jnp.sin(phi_a), jnp.cos(phi_a)
    tan2_a = -log_u / jnp.maximum(cp * cp / jnp.maximum(ax * ax, 1e-20)
                                  + sp * sp / jnp.maximum(ay * ay, 1e-20), 1e-20)

    phi = jnp.where(iso, phi_i, phi_a)
    tan2 = jnp.where(iso, tan2_i, tan2_a)
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


# --- shared G / pdf --------------------------------------------------------


def smith_g1(lam):
    return 1.0 / (1.0 + lam)


def smith_g(lam_wo, lam_wi):
    return 1.0 / (1.0 + lam_wo + lam_wi)


def mf_pdf(d_wh, wh):
    """Full-NDF sampling pdf: D(wh) |cos θh| (microfacet.rs:28-31)."""
    return d_wh * abs_cos_theta(wh)
