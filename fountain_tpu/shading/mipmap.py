"""Mipmapped image atlas: host-side pyramid build + device gather lookups.

TPU-native analog of reference ``src/mipmap.rs`` + ``src/blocked_array.rs``:

- pyramid build happens on the host in numpy (reference MIPMap::new,
  mipmap.rs:77-147): non-pow2 images are resampled up with a Lanczos-2
  windowed-sinc kernel (mipmap.rs:157-208,314-339), then each level is a
  2x2 box downsample of the previous (mipmap.rs:215-235),
- ALL levels of ALL images are concatenated into one flat [T, 3] texel
  array (`ImageAtlas`) so a whole wavefront of lookups with divergent
  image ids / levels is a single batched gather — the TPU replacement for
  the reference's per-texel cache-blocked fetches (blocked_array.rs:59-66;
  HBM gathers have no cache lines to block for),
- trilinear lookup by filter width (mipmap.rs:245-279) = two bilerps +
  a lerp, all gathers,
- wrap modes Repeat/Clamp/Black (mipmap.rs:14-17,297-312).

The atlas is a pytree and differentiable w.r.t. `texels` (env-map /
texture optimization).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from fountain_tpu.core.vecmath import Float

WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_BLACK = 2

MAX_LEVELS = 16  # images up to 32768^2


class ImageAtlas(NamedTuple):
    texels: jnp.ndarray        # [T, 3] float32, all levels concatenated
    level_offset: jnp.ndarray  # [I, MAX_LEVELS] int32 (clamped at top level)
    level_w: jnp.ndarray       # [I, MAX_LEVELS] int32
    level_h: jnp.ndarray       # [I, MAX_LEVELS] int32
    n_levels: jnp.ndarray      # [I] int32
    wrap: jnp.ndarray          # [I] int32

    @property
    def count(self) -> int:
        return self.n_levels.shape[0]


# ---------------------------------------------------------------------------
# Host-side pyramid construction (numpy)
# ---------------------------------------------------------------------------


def _lanczos(x: np.ndarray, tau: float = 2.0) -> np.ndarray:
    """Windowed sinc (reference mipmap.rs:314-339 / math.rs lanczos)."""
    x = np.abs(x)
    w = np.sinc(x / tau)          # window
    s = np.sinc(x)                # sinc
    return np.where(x < tau, s * w, 0.0)


def _resample_axis(img: np.ndarray, new_n: int, axis: int) -> np.ndarray:
    """Separable Lanczos-2 resample along one axis (reference
    resample_weights, mipmap.rs:157-208). Upsamples old_n -> new_n >= old_n."""
    old_n = img.shape[axis]
    if old_n == new_n:
        return img
    filter_width = 2.0
    x_new = (np.arange(new_n) + 0.5) * old_n / new_n   # continuous old coords
    first = np.floor(x_new - filter_width + 0.5).astype(np.int64)
    offs = np.arange(4)
    idx = first[:, None] + offs[None, :]               # [new_n, 4]
    w = _lanczos(x_new[:, None] - (idx + 0.5))
    wsum = w.sum(axis=1, keepdims=True)
    w = w / np.where(wsum == 0.0, 1.0, wsum)
    idx = np.clip(idx, 0, old_n - 1)                   # clamp boundary
    moved = np.moveaxis(img, axis, 0)                  # [old_n, ...]
    out = np.einsum("nk,nk...->n...", w, moved[idx])
    return np.moveaxis(out.astype(np.float32), 0, axis)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def build_pyramid(img: np.ndarray) -> List[np.ndarray]:
    """Full mip chain for one image (reference MIPMap::new pyramid loop,
    mipmap.rs:215-235): pow2 resample, then repeated 2x2 box downsample."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    if (h & (h - 1)) or (w & (w - 1)):
        img = _resample_axis(img, _next_pow2(w), axis=1)
        img = _resample_axis(img, _next_pow2(h), axis=0)
        h, w = img.shape[:2]
    levels = [img]
    while h > 1 or w > 1:
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        prev = levels[-1]
        # 2x2 box average (degenerate axes average available texels)
        ph = prev[: nh * 2 if h > 1 else nh]
        if h > 1:
            ph = (ph[0::2] + ph[1::2]) * 0.5
        if w > 1:
            ph = (ph[:, 0::2] + ph[:, 1::2]) * 0.5
        levels.append(ph.astype(np.float32))
        h, w = nh, nw
    return levels


def build_atlas(images: Sequence[np.ndarray],
                wraps: Optional[Sequence[int]] = None) -> Optional[ImageAtlas]:
    """Compile a list of [H, W, 3] images into one flat mipmapped atlas."""
    if not images:
        return None
    wraps = list(wraps) if wraps is not None else [WRAP_REPEAT] * len(images)
    texels = []
    offsets = np.zeros((len(images), MAX_LEVELS), np.int64)
    lw = np.ones((len(images), MAX_LEVELS), np.int64)
    lh = np.ones((len(images), MAX_LEVELS), np.int64)
    nlev = np.zeros((len(images),), np.int64)
    cursor = 0
    for i, img in enumerate(images):
        pyr = build_pyramid(img)
        nlev[i] = len(pyr)
        for li, level in enumerate(pyr):
            offsets[i, li] = cursor
            lh[i, li], lw[i, li] = level.shape[:2]
            texels.append(level.reshape(-1, 3))
            cursor += level.shape[0] * level.shape[1]
        # out-of-range levels clamp to the 1x1 top
        offsets[i, len(pyr):] = offsets[i, len(pyr) - 1]
        lw[i, len(pyr):] = 1
        lh[i, len(pyr):] = 1
    return ImageAtlas(
        texels=jnp.asarray(np.concatenate(texels), jnp.float32),
        level_offset=jnp.asarray(offsets, jnp.int32),
        level_w=jnp.asarray(lw, jnp.int32),
        level_h=jnp.asarray(lh, jnp.int32),
        n_levels=jnp.asarray(nlev, jnp.int32),
        wrap=jnp.asarray(wraps, jnp.int32))


# ---------------------------------------------------------------------------
# Device lookups (batched gathers)
# ---------------------------------------------------------------------------


def _wrap_coord(c, n, wrap):
    """Integer texel coordinate wrap (reference mipmap.rs:297-312).
    Returns (index, inside) — `inside` is False for Black-mode outside."""
    inside = (c >= 0) & (c < n)
    rep = jnp.remainder(c, jnp.maximum(n, 1))
    clamped = jnp.clip(c, 0, n - 1)
    idx = jnp.where(wrap == WRAP_REPEAT, rep, clamped)
    ok = jnp.where(wrap == WRAP_BLACK, inside, True)
    return idx, ok


def _bilerp_level(atlas: ImageAtlas, image_id, level, u, v):
    """Bilinear fetch at one mip level (reference MIPMap::triangle,
    mipmap.rs:264-279); all args per-lane arrays. Returns a component-SoA
    V3 (three flat [N] texel-channel gathers — zero tile padding; the old
    [N, 3] row gather padded 42.7x when materialized)."""
    from fountain_tpu.core.gather import select_rows, take3
    from fountain_tpu.core.vecmath import where3
    # the level/layout tables are tiny ([I, MAX_LEVELS]); per-lane fancy
    # indexing compiled to real gathers at ~2-6 ms per 262k lanes EACH and
    # the rematted backward re-ran them ~200x (round-5 profile: 390 ms/step)
    # — select-sum them instead (zero gather ops).
    level = jnp.clip(level, 0, select_rows(atlas.n_levels, image_id) - 1)
    flat = image_id * MAX_LEVELS + level
    off = select_rows(atlas.level_offset.reshape(-1), flat)
    w = select_rows(atlas.level_w.reshape(-1), flat)
    h = select_rows(atlas.level_h.reshape(-1), flat)
    wrap = select_rows(atlas.wrap, image_id)

    s = u * w.astype(Float) - 0.5
    t = v * h.astype(Float) - 0.5
    s0 = jnp.floor(s).astype(jnp.int32)
    t0 = jnp.floor(t).astype(jnp.int32)
    ds = s - s0
    dt = t - t0

    def texel(si, ti):
        xi, okx = _wrap_coord(si, w, wrap)
        yi, oky = _wrap_coord(ti, h, wrap)
        val = take3(atlas.texels, off + yi * w + xi)
        return where3(okx & oky, val, 0.0)

    return (texel(s0, t0) * ((1 - ds) * (1 - dt))
            + texel(s0, t0 + 1) * ((1 - ds) * dt)
            + texel(s0 + 1, t0) * (ds * (1 - dt))
            + texel(s0 + 1, t0 + 1) * (ds * dt))


def lookup_trilinear(atlas: ImageAtlas, image_id, u, v, width=None):
    """Trilinear (width-selected mip level) lookup, batched over lanes
    (reference lookup_trilinear_width, mipmap.rs:245-262). Returns V3.

    width: per-lane filter width in uv space (None / 0 => finest level).
    """
    from fountain_tpu.core.gather import select_rows
    image_id = jnp.clip(image_id, 0, atlas.count - 1).astype(jnp.int32)
    nl = select_rows(atlas.n_levels, image_id).astype(Float)
    if width is None:
        return _bilerp_level(atlas, image_id,
                             jnp.zeros_like(image_id), u, v)
    width = jnp.maximum(width, 1e-8)
    # level such that width covers one texel: nLevels-1+log2(width)
    lvl = nl - 1.0 + jnp.log2(width)
    lvl = jnp.clip(lvl, 0.0, nl - 1.0)
    l0 = jnp.floor(lvl).astype(jnp.int32)
    dl = lvl - l0.astype(Float)
    a = _bilerp_level(atlas, image_id, l0, u, v)
    b = _bilerp_level(atlas, image_id, l0 + 1, u, v)
    return a * (1.0 - dl) + b * dl
