"""Sampling warps and piecewise-constant distributions.

TPU-native analog of reference ``src/sampling.rs``:
- warp functions (concentric disk :5-19, cosine hemisphere :21-25, uniform
  sphere/cone/triangle, power heuristic :53-57), batched and branch-free;
- ``Distribution1D``/``Distribution2D`` (:59-180) for env-map importance
  sampling, with the CDF binary search (:66-81) replaced by a vectorized
  ``searchsorted`` over the whole wavefront.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fountain_tpu.core.vecmath import (Float, PI, INV_PI, PI_OVER_2,
                                       PI_OVER_4, V3, vec)


def concentric_sample_disk(u1, u2):
    """Map U[0,1)^2 to the unit disk, concentric (low-distortion) mapping.

    Branch-free version of reference sampling.rs:5-19.
    Returns (x, y).
    """
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    at_origin = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_div = jnp.where(use_x,
                         oy / jnp.where(ox == 0.0, 1.0, ox),
                         ox / jnp.where(oy == 0.0, 1.0, oy))
    theta = jnp.where(use_x, PI_OVER_4 * safe_div,
                      PI_OVER_2 - PI_OVER_4 * safe_div)
    x = jnp.where(at_origin, 0.0, r * jnp.cos(theta))
    y = jnp.where(at_origin, 0.0, r * jnp.sin(theta))
    return x, y


def cosine_sample_hemisphere(u1, u2):
    """Cosine-weighted hemisphere about +z (reference sampling.rs:21-25)."""
    x, y = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return V3(x, y, z)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_sphere(u1, u2):
    """Uniform direction on the full sphere (reference sampling.rs)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


UNIFORM_SPHERE_PDF = 1.0 / (4.0 * PI)
UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * PI)


def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), jnp.broadcast_to(z, jnp.shape(r)))


def uniform_sample_triangle(u1, u2):
    """Barycentric (b0, b1) uniform over a triangle."""
    su0 = jnp.sqrt(u1)
    return 1.0 - su0, u2 * su0


def uniform_sample_cone(u1, u2, cos_theta_max):
    """Uniform direction in a cone about +z."""
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u2
    return V3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Power heuristic (beta=2) MIS weight (reference sampling.rs:53-57),
    guarded against f_pdf = g_pdf = 0."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom == 0.0, 1.0, denom), 0.0)


class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution (reference sampling.rs:59-135).

    func: [n] non-negative bucket values;
    cdf:  [n+1] with cdf[0]=0, cdf[n]=1 (uniform if func sums to 0);
    func_int: [] the unnormalized integral (mean of func).
    """
    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @property
    def count(self) -> int:
        return self.func.shape[-1]


def make_distribution_1d(func: jnp.ndarray) -> Distribution1D:
    func = jnp.asarray(func, Float)
    n = func.shape[-1]
    csum = jnp.cumsum(func, axis=-1) / n
    cdf = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    func_int = cdf[..., -1]
    uniform = (jnp.arange(n + 1, dtype=Float) / n) * jnp.ones_like(cdf)
    safe = jnp.where(func_int[..., None] == 0.0, 1.0, func_int[..., None])
    cdf = jnp.where(func_int[..., None] > 0.0, cdf / safe, uniform)
    return Distribution1D(func, cdf, func_int)


def _find_interval(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Largest index i with cdf[..., i] <= u (reference sampling.rs:66-81),
    via searchsorted. cdf has shape [..., n+1], u [...]; returns [...] int32
    in [0, n-1]."""
    if cdf.ndim == 1:
        idx = jnp.searchsorted(cdf, u, side="right") - 1
    else:
        # batched rows: one searchsorted per row via vmap-compatible trick
        idx = jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, cdf.shape[-1] - 2)


def sample_distribution_1d_continuous(d: Distribution1D, u: jnp.ndarray):
    """Sample x in [0,1); returns (x, pdf, offset)
    (reference sampling.rs:106-121)."""
    offset = _find_interval(d.cdf, u)
    c0 = jnp.take_along_axis(d.cdf, offset[..., None], axis=-1)[..., 0] \
        if d.cdf.ndim > 1 else d.cdf[offset]
    c1 = jnp.take_along_axis(d.cdf, offset[..., None] + 1, axis=-1)[..., 0] \
        if d.cdf.ndim > 1 else d.cdf[offset + 1]
    du = u - c0
    width = c1 - c0
    du = jnp.where(width > 0.0, du / jnp.where(width == 0.0, 1.0, width), du)
    f = jnp.take_along_axis(d.func, offset[..., None], axis=-1)[..., 0] \
        if d.func.ndim > 1 else d.func[offset]
    pdf = jnp.where(d.func_int > 0.0, f / jnp.where(d.func_int == 0.0, 1.0, d.func_int), 0.0)
    n = d.count
    x = (offset.astype(Float) + du) / n
    return x, pdf, offset


def sample_distribution_1d_discrete(d: Distribution1D, u: jnp.ndarray):
    """Sample a bucket index; returns (index, pmf)
    (reference sampling.rs:123-134)."""
    offset = _find_interval(d.cdf, u)
    f = d.func[offset] if d.func.ndim == 1 else \
        jnp.take_along_axis(d.func, offset[..., None], axis=-1)[..., 0]
    n = d.count
    pmf = jnp.where(d.func_int > 0.0,
                    f / (jnp.where(d.func_int == 0.0, 1.0, d.func_int) * n), 0.0)
    return offset, pmf


class Distribution2D(NamedTuple):
    """2D piecewise-constant distribution (reference sampling.rs:143-180):
    per-row conditional p(u|v) + marginal over rows. Shapes: conditional
    func/cdf [nv, nu]/[nv, nu+1]; marginal over [nv]."""
    cond_func: jnp.ndarray
    cond_cdf: jnp.ndarray
    cond_int: jnp.ndarray
    marginal: Distribution1D


def make_distribution_2d(func: jnp.ndarray) -> Distribution2D:
    """func: [nv, nu] non-negative (e.g. env-map luminance * sin(theta))."""
    func = jnp.asarray(func, Float)
    nv, nu = func.shape
    rows = make_distribution_1d(func)  # batched over leading axis
    marginal = make_distribution_1d(rows.func_int)
    return Distribution2D(rows.func, rows.cdf, rows.func_int, marginal)


def sample_distribution_2d(d: Distribution2D, u1, u2):
    """Sample (u, v) in [0,1)^2 with pdf w.r.t. that unit square
    (reference sampling.rs:163-169). u1 picks the row (v), u2 the column."""
    v, pdf_v, iv = sample_distribution_1d_continuous(d.marginal, u1)
    cond = Distribution1D(d.cond_func[iv], d.cond_cdf[iv], d.cond_int[iv])
    u, pdf_u, _ = sample_distribution_1d_continuous(cond, u2)
    return u, v, pdf_u * pdf_v


def pdf_distribution_2d(d: Distribution2D, u, v):
    """Pdf of sample_distribution_2d at continuous (u, v)
    (reference sampling.rs:171-179)."""
    nv, nu = d.cond_func.shape
    iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
    denom = d.marginal.func_int
    return jnp.where(denom > 0.0,
                     d.cond_func[iv, iu] / jnp.where(denom == 0.0, 1.0, denom),
                     0.0)


# --- per-light stacked 2D distributions ------------------------------------
# The reference builds one Distribution2D PER InfiniteAreaLight
# (infinite.rs:63-77); a single shared distribution gives a wrong MIS pdf
# the moment a scene has two env maps. The stack adds a leading slot axis
# to every array; each lane indexes its own light's distribution.


def make_distribution_2d_stack(funcs) -> Distribution2D:
    """Stack per-light [nv, nu] funcs (all the same shape) into a
    Distribution2D with leading slot axis: cond_func [S, nv, nu],
    cond_cdf [S, nv, nu+1], marginal func/cdf [S, nv]/[S, nv+1]."""
    func = jnp.stack([jnp.asarray(f, Float) for f in funcs])
    s, nv, nu = func.shape
    rows = make_distribution_1d(func)          # batched over [S, nv]
    marginal = make_distribution_1d(rows.func_int)
    return Distribution2D(rows.func, rows.cdf, rows.func_int, marginal)


def sample_distribution_2d_slot(d: Distribution2D, slot, u1, u2):
    """Per-lane sample of a stacked Distribution2D: ``slot`` [N] picks the
    light's distribution; returns (u, v, pdf) like sample_distribution_2d."""
    marg = Distribution1D(d.marginal.func[slot], d.marginal.cdf[slot],
                          d.marginal.func_int[slot])
    v, pdf_v, iv = sample_distribution_1d_continuous(marg, u1)
    cond = Distribution1D(d.cond_func[slot, iv], d.cond_cdf[slot, iv],
                          d.cond_int[slot, iv])
    u, pdf_u, _ = sample_distribution_1d_continuous(cond, u2)
    return u, v, pdf_u * pdf_v


def pdf_distribution_2d_slot(d: Distribution2D, slot, u, v):
    """Pdf of sample_distribution_2d_slot at continuous (u, v)."""
    nv, nu = d.cond_func.shape[-2:]
    iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
    denom = d.marginal.func_int[slot]
    return jnp.where(denom > 0.0,
                     d.cond_func[slot, iv, iu]
                     / jnp.where(denom == 0.0, 1.0, denom), 0.0)
