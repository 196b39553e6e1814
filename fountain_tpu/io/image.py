"""Image loading/saving: PNG/JPG (via PIL) and EXR (own reader).

Host-side analog of reference ``src/imageio/mod.rs``: LDR images are
sRGB-decoded to linear on load (gamma_correct/inverse, imageio/mod.rs:
161-175), and flipped so v=0 is the bottom row (flip_y, imageio/mod.rs:
108-116, matching PBRT texture-space conventions).
"""
from __future__ import annotations

import os

import numpy as np

from fountain_tpu.io.exr import read_exr, write_exr  # noqa: F401


def _srgb_to_linear(v: np.ndarray) -> np.ndarray:
    return np.where(v <= 0.04045, v / 12.92,
                    ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _linear_to_srgb(v: np.ndarray) -> np.ndarray:
    v = np.clip(v, 0.0, 1.0)
    return np.where(v <= 0.0031308, 12.92 * v,
                    1.055 * v ** (1.0 / 2.4) - 0.055).astype(np.float32)


# process-global decode cache keyed by the FULL option tuple, matching
# the reference's global mipmap cache key (path, wrap, scale, gamma,
# flip) under once_cell (imageio/mod.rs:60-78); wrap/scale apply at the
# atlas/texture layer here, so the decode key is (abspath, gamma, flip)
_DECODE_CACHE: dict = {}


def load_image(path: str, gamma: bool = None, flip_y: bool = True
               ) -> np.ndarray:
    """Load an image as linear float32 [H, W, 3].

    `gamma=None` auto-decides: LDR formats are sRGB-decoded, EXR is linear
    (reference imageio/mod.rs:127-149). Decodes are cached per process
    keyed by (abspath, gamma, flip_y); the returned array is shared — do
    not mutate in place.
    """
    # mtime in the key: a file rewritten between scene builds must not
    # serve the stale decode; the cached array is frozen so an in-place
    # mutation by a caller raises instead of corrupting later builds
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    key = (os.path.abspath(path), gamma, flip_y, mtime)
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        img = read_exr(path)
    else:
        from PIL import Image
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
        img = _srgb_to_linear(arr) if (gamma is None or gamma) else arr
    if flip_y:
        img = img[::-1].copy()
    img = np.ascontiguousarray(img.astype(np.float32))
    img.flags.writeable = False
    _DECODE_CACHE[key] = img
    return img


def save_image(path: str, img: np.ndarray) -> None:
    """Save linear float32 [H, W, 3]: EXR stays linear, PNG/JPG are sRGB
    encoded (reference write_exr imageio/exr.rs:47-87 + PNG path)."""
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img, np.float32)
    if ext == ".exr":
        write_exr(path, img)
        return
    from PIL import Image
    ldr = (np.clip(_linear_to_srgb(img), 0, 1) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(ldr).save(path)
