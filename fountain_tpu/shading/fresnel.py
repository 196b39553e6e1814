"""Fresnel reflectance: exact dielectric and spectral conductor.

TPU-native analog of reference ``src/fresnel.rs``:
- ``fresnel_dielectric`` (fresnel.rs:4-22): exact unpolarized dielectric with
  index swap on exiting rays, total-internal-reflection → 1,
- ``fresnel_conductor`` (fresnel.rs:25-48): full complex-IOR conductor form
  evaluated per RGB channel.

Batched and branch-free; cos_theta_i may be any sign (negative = exiting).
"""
from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized Fresnel reflectance at a dielectric boundary.

    Swaps indices when cos_theta_i < 0 (ray exiting the medium), mirrors
    reference fresnel.rs:4-22. Returns reflectance in [0, 1].
    """
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)

    # sqrt floors are 1e-36 (not 0): sqrt'(0)=inf leaks NaN cotangents
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 1e-36))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 1e-36))

    r_parl = ((et * cos_i) - (ei * cos_t)) / \
        jnp.maximum((et * cos_i) + (ei * cos_t), 1e-20)
    r_perp = ((ei * cos_i) - (et * cos_t)) / \
        jnp.maximum((ei * cos_i) + (et * cos_t), 1e-20)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_theta_i, eta_i, eta_t, k):
    """Conductor Fresnel with complex IOR eta_t + i*k, per channel.

    cos_theta_i [N]; eta_i/eta_t/k V3 (per-RGB-channel) — returns V3.
    Mirrors reference fresnel.rs:25-48 (pbrt FrConductor); evaluated once
    per component in flat-[N] layout (see core.vecmath.V3).
    """
    from fountain_tpu.core.vecmath import V3
    cos_i = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2

    def chan(ei, et, kk):
        eta = et / ei
        eta_k = kk / ei
        eta2 = eta * eta
        eta_k2 = eta_k * eta_k
        t0 = eta2 - eta_k2 - sin2
        a2_plus_b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * eta_k2, 1e-36))
        t1 = a2_plus_b2 + cos2
        a = jnp.sqrt(jnp.maximum(0.5 * (a2_plus_b2 + t0), 1e-36))
        t2 = 2.0 * a * cos_i
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
        t3 = cos2 * a2_plus_b2 + sin2 * sin2
        t4 = t2 * sin2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
        return 0.5 * (rp + rs)

    return V3(chan(eta_i.x, eta_t.x, k.x), chan(eta_i.y, eta_t.y, k.y),
              chan(eta_i.z, eta_t.z, k.z))
