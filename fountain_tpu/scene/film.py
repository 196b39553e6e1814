"""Film: reconstruction-filtered sample accumulation.

TPU-native analog of reference ``src/film.rs`` + ``src/filter/mod.rs``:
- the mutex-guarded tile merge (film.rs:24,121-132) becomes a pure
  scatter-add over (rgb, weight) accumulator arrays — partial sums are
  associative, so multi-chip films `psum` for free,
- the 16×16 precomputed filter table (film.rs:61-71) becomes an analytic
  filter evaluation over the (2r)² support window, unrolled statically,
- accumulators hold linear RGB (the reference accumulates XYZ and converts
  on output, film.rs:195-210 — both are linear maps and commute with the
  filter sums; RGB avoids two conversions).

Layout: the film is CHANNEL-PLANAR — three [H, W] sum planes + one weight
plane — matching the wavefront's component-SoA V3 convention
(core.vecmath.V3): every splat tap is then adds over flat [H*W] arrays
with zero TPU tile padding (an interleaved [H, W, 3] accumulator padded
42.7x whenever a tap materialized).

Checkpoint/resume: (r/g/b sums, weight_sum, sample counter) is the
complete frame state (SURVEY.md §5 checkpointing note).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fountain_tpu.core.vecmath import Float, V3

FILTER_BOX = 0
FILTER_TRIANGLE = 1
FILTER_GAUSSIAN = 2


class Film(NamedTuple):
    r_sum: jnp.ndarray       # [H, W]
    g_sum: jnp.ndarray       # [H, W]
    b_sum: jnp.ndarray       # [H, W]
    weight_sum: jnp.ndarray  # [H, W]

    @property
    def resolution(self) -> Tuple[int, int]:
        h, w = self.weight_sum.shape
        return w, h

    @property
    def rgb_sum(self) -> jnp.ndarray:
        """Interleaved [H, W, 3] view (host/IO boundary only)."""
        return jnp.stack([self.r_sum, self.g_sum, self.b_sum], axis=-1)


def make_film(xres: int, yres: int) -> Film:
    z = jnp.zeros((yres, xres), Float)
    return Film(r_sum=z, g_sum=z, b_sum=z, weight_sum=z)


def filter_weight(ftype: int, radius: float, dx, dy):
    """Filter kernel value at continuous offset (dx, dy) from the sample.

    box: 1 inside support (reference filter/mod.rs:10-33);
    triangle: tent; gaussian: pbrt alpha=2 with edge subtraction.
    """
    ax, ay = jnp.abs(dx), jnp.abs(dy)
    inside = (ax <= radius) & (ay <= radius)
    if ftype == FILTER_BOX:
        w = jnp.ones_like(dx)
    elif ftype == FILTER_TRIANGLE:
        w = jnp.maximum(radius - ax, 0.0) * jnp.maximum(radius - ay, 0.0)
    else:  # gaussian
        alpha = 2.0
        edge = jnp.exp(-alpha * radius * radius)
        gx = jnp.maximum(jnp.exp(-alpha * dx * dx) - edge, 0.0)
        gy = jnp.maximum(jnp.exp(-alpha * dy * dy) - edge, 0.0)
        w = gx * gy
    return jnp.where(inside, w, 0.0)


def _support_taps(radius: float) -> int:
    """Half-width in pixels of the filter support around the containing
    pixel: a pixel center at offset o can be within `radius` of a sample
    in the base pixel iff |o| - 0.5 < radius -> K = ceil(radius - 0.5)."""
    import math
    return max(int(math.ceil(radius - 0.5 - 1e-6)), 0)


def add_samples(film: Film, px_f, py_f, radiance: V3,
                ftype: int = FILTER_BOX, radius: float = 0.5) -> Film:
    """Splat samples at continuous raster positions (px_f, py_f) [N] with
    values radiance (V3) — reference add_sample_to_tile film.rs:136-172.

    The filter support window (discrete pixels whose center is within
    `radius` of the sample) is enumerated statically around the pixel
    containing the sample: 1 tap for radius<=0.5, 3x3 for radius<=1.5, etc.
    Each tap is a masked scatter-add; XLA fuses the taps.

    NOTE: scatter-adds are expensive on TPU. When samples are lane-aligned
    with pixels (the render driver's layout), use `add_samples_aligned`.
    """
    h, w = film.weight_sum.shape
    taps = _support_taps(radius)
    r = film.r_sum.reshape(-1)
    g = film.g_sum.reshape(-1)
    b = film.b_sum.reshape(-1)
    wsum = film.weight_sum.reshape(-1)
    # pixel containing the sample (pbrt convention: pixel (x,y) covers
    # [x,x+1)x[y,y+1), center (x+0.5, y+0.5))
    px0 = jnp.floor(px_f)
    py0 = jnp.floor(py_f)
    finite = radiance.isfinite()
    from fountain_tpu.core.vecmath import where3
    radiance = where3(finite, radiance, 0.0)
    for oy in range(-taps, taps + 1):
        for ox in range(-taps, taps + 1):
            px = px0 + ox
            py = py0 + oy
            dx = (px + 0.5) - px_f
            dy = (py + 0.5) - py_f
            fw = filter_weight(ftype, radius, dx, dy)
            inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & finite
            fw = jnp.where(inb, fw, 0.0)
            idx = (jnp.clip(py, 0, h - 1) * w
                   + jnp.clip(px, 0, w - 1)).astype(jnp.int32)
            r = r.at[idx].add(fw * radiance.x, mode="drop")
            g = g.at[idx].add(fw * radiance.y, mode="drop")
            b = b.at[idx].add(fw * radiance.z, mode="drop")
            wsum = wsum.at[idx].add(fw, mode="drop")
    return Film(r_sum=r.reshape(h, w), g_sum=g.reshape(h, w),
                b_sum=b.reshape(h, w), weight_sum=wsum.reshape(h, w))


def add_samples_aligned(film: Film, frac_x, frac_y, radiance: V3,
                        ftype: int = FILTER_BOX, radius: float = 0.5,
                        lane_offset=0) -> Film:
    """Scatter-free splat for the wavefront layout: lane i is the sample for
    pixel (lane_offset + i) in row-major order, jittered by
    (frac_x, frac_y) in [0,1)^2 within its pixel.

    Every filter tap then lands at a *fixed* pixel offset (ox, oy) from the
    lane's own pixel — a shifted dense add (pad + slice) instead of a
    scatter. This is the TPU-shaped formulation of the reference's filter
    splat (film.rs:136-172): pure VPU adds, no scatter sort.

    Supports partial waves (lane_offset/n_lanes) for sharding: rows are
    handled by flattening the film; a tap at (ox, oy) shifts the flat index
    by oy*W + ox, exact for all rows (x-edge pixels are masked by fw=0
    through the in-bounds test below).
    """
    from fountain_tpu.core.vecmath import where3
    h, w = film.weight_sum.shape
    taps = _support_taps(radius)
    n = frac_x.shape[0]
    finite = radiance.isfinite()
    radiance = where3(finite, radiance, 0.0)

    full_frame = (isinstance(lane_offset, int) and lane_offset == 0
                  and n == h * w)
    if taps > 0 and not full_frame:
        # partial wave with a wide filter: generic scatter path
        lane = lane_offset + jnp.arange(n, dtype=jnp.int32)
        return add_samples(film, (lane % w).astype(Float) + frac_x,
                           (lane // w).astype(Float) + frac_y,
                           radiance, ftype=ftype, radius=radius)

    r = film.r_sum.reshape(-1)
    g = film.g_sum.reshape(-1)
    b = film.b_sum.reshape(-1)
    wsum = film.weight_sum.reshape(-1)
    lane = lane_offset + jnp.arange(n, dtype=jnp.int32)
    px = lane % w
    py = lane // w

    for oy in range(-taps, taps + 1):
        for ox in range(-taps, taps + 1):
            # offset of the tap pixel center from the sample position
            dx = (ox + 0.5) - frac_x
            dy = (oy + 0.5) - frac_y
            fw = filter_weight(ftype, radius, dx, dy)
            inb = ((px + ox >= 0) & (px + ox < w)
                   & (py + oy >= 0) & (py + oy < h) & finite)
            fw = jnp.where(inb, fw, 0.0)
            if taps == 0:
                # dense add over the lane window (identity mapping)
                def upd(plane, contrib):
                    return jax.lax.dynamic_update_slice(
                        plane, jax.lax.dynamic_slice(
                            plane, (lane_offset,), (n,)) + contrib,
                        (lane_offset,))
                r = upd(r, fw * radiance.x)
                g = upd(g, fw * radiance.y)
                b = upd(b, fw * radiance.z)
                wsum = upd(wsum, fw)
            else:
                # full frame: target[j] = contrib[j - shift]; wrapped lanes
                # already have fw = 0 via the x/y bounds mask
                shift = oy * w + ox
                r = r + jnp.roll(fw * radiance.x, shift)
                g = g + jnp.roll(fw * radiance.y, shift)
                b = b + jnp.roll(fw * radiance.z, shift)
                wsum = wsum + jnp.roll(fw, shift)
    return Film(r_sum=r.reshape(h, w), g_sum=g.reshape(h, w),
                b_sum=b.reshape(h, w), weight_sum=wsum.reshape(h, w))


def finalize(film: Film) -> jnp.ndarray:
    """Weight-normalized image [H,W,3] (reference into_spectrum_buffer,
    film.rs:195-210)."""
    inv = jnp.where(film.weight_sum > 0.0,
                    1.0 / jnp.maximum(film.weight_sum, 1e-12), 0.0)
    return jnp.stack([film.r_sum * inv, film.g_sum * inv,
                      film.b_sum * inv], axis=-1)
