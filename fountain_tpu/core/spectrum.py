"""RGB spectrum helpers.

TPU-native analog of reference ``src/spectrum/mod.rs`` (Spectrum =
CoefficientSpectrum<3>, RGB). A spectrum is just a ``[..., 3]`` jnp array;
arithmetic is ordinary array arithmetic, so only the color-science helpers
live here (XYZ<->RGB, spectrum/mod.rs:28-43; luminance, :104-107).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fountain_tpu.core.vecmath import Float

# Row-vector matrices matching the reference coefficient tables
# (spectrum/mod.rs:28-43, standard CIE sRGB primaries).
# numpy (not jnp) so importing the package never initializes the XLA
# backend — jax.distributed.initialize must run first in multi-process
_XYZ_TO_RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311],
], dtype=Float)

_RGB_TO_XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], dtype=Float)


def xyz_to_rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", _XYZ_TO_RGB, xyz)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", _RGB_TO_XYZ, rgb)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """y component of XYZ (reference spectrum/mod.rs:104-107)."""
    return rgb_to_xyz(rgb)[..., 1]


def is_black(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(rgb == 0.0, axis=-1)


def max_component(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(rgb, axis=-1)


def gamma_correct(v: jnp.ndarray) -> jnp.ndarray:
    """sRGB encode (reference src/imageio/mod.rs:161-168)."""
    return jnp.where(v <= 0.0031308, 12.92 * v,
                     1.055 * jnp.power(jnp.maximum(v, 1e-8), 1.0 / 2.4) - 0.055)


def inverse_gamma_correct(v: jnp.ndarray) -> jnp.ndarray:
    """sRGB decode (reference src/imageio/mod.rs:170-175)."""
    return jnp.where(v <= 0.04045, v / 12.92,
                     jnp.power((v + 0.055) / 1.055, 2.4))
