"""4x4 affine transforms with cached inverses, as jnp arrays.

TPU-native analog of reference ``src/geometry/transform.rs``. A Transform is
a pytree of two ``[4,4]`` (or batched ``[..., 4, 4]``) matrices: ``m`` and
``m_inv``. Points/vectors/normals transform differently (normals use the
inverse transpose, transform.rs:133-139); error-propagating variants mirror
``tf_exact_to_err`` (transform.rs:181-266) so spawned rays stay robust.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fountain_tpu.core.vecmath import Float, gamma, cross, dot, normalize


def _mm(a, b):
    """4x4 matmul at full f32 precision (TPU matmuls default to lower
    precision, which is unacceptable for geometry)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _inv(m):
    """4x4 inverse at full precision. jnp.linalg.inv's LU runs at the
    backend's default matmul precision — bf16-grade on TPU, which put
    ~1e-3 errors into every cached camera/object inverse. Concrete
    (scene-build-time) matrices invert exactly in f64 on the host;
    traced ones fall back to LU pinned at HIGHEST."""
    if not isinstance(m, jax.core.Tracer):
        return jnp.asarray(np.linalg.inv(np.asarray(m, np.float64)), Float)
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.inv(m).astype(Float)


class Transform(NamedTuple):
    """m maps object→target space; m_inv is its cached inverse."""
    m: jnp.ndarray      # [..., 4, 4]
    m_inv: jnp.ndarray  # [..., 4, 4]

    @property
    def inverse(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(_mm(self.m, other.m), _mm(other.m_inv, self.m_inv))

    def swaps_handedness(self) -> jnp.ndarray:
        """True when the upper-3x3 determinant is negative
        (reference transform.rs; used for Shape::flip_normals)."""
        return jnp.linalg.det(self.m[..., :3, :3]) < 0.0


def identity() -> Transform:
    eye = jnp.eye(4, dtype=Float)
    return Transform(eye, eye)


def from_matrix(m) -> Transform:
    m = jnp.asarray(m, Float)
    return Transform(m, _inv(m))


def translate(delta) -> Transform:
    delta = jnp.asarray(delta, Float)
    m = jnp.eye(4, dtype=Float).at[:3, 3].set(delta)
    mi = jnp.eye(4, dtype=Float).at[:3, 3].set(-delta)
    return Transform(m, mi)


def scale(sx, sy, sz) -> Transform:
    s = jnp.asarray([sx, sy, sz, 1.0], Float)
    return Transform(jnp.diag(s), jnp.diag(1.0 / s))


def rotate(angle_deg, axis) -> Transform:
    """Rotation about an arbitrary axis (degrees, like the PBRT Rotate stmt)."""
    a = normalize(jnp.asarray(axis, Float))
    theta = jnp.deg2rad(jnp.asarray(angle_deg, Float))
    s, c = jnp.sin(theta), jnp.cos(theta)
    x, y, z = a[0], a[1], a[2]
    m3 = jnp.array([
        [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s],
        [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c],
    ], dtype=Float)
    m = jnp.eye(4, dtype=Float).at[:3, :3].set(m3)
    return Transform(m, m.T)


def look_at(eye, look, up) -> Transform:
    """Camera-to-world from LookAt (reference transform.rs look_at; PBRT
    convention: +z towards `look`, left-handed basis dir×up, up re-derived)."""
    eye = jnp.asarray(eye, Float)
    look = jnp.asarray(look, Float)
    up = jnp.asarray(up, Float)
    direction = normalize(look - eye)
    right = normalize(cross(normalize(up), direction))
    new_up = cross(direction, right)
    m = jnp.stack([
        jnp.append(right, 0.0),
        jnp.append(new_up, 0.0),
        jnp.append(direction, 0.0),
        jnp.append(eye, 1.0),
    ], axis=-1).astype(Float)  # columns: right, up, dir, eye
    return Transform(m, _inv(m))


def perspective(fov_deg, near, far) -> Transform:
    """Perspective projection (reference transform.rs:105-115): z mapped to
    [0,1] over [near,far], x/y scaled by 1/tan(fov/2)."""
    fov = jnp.deg2rad(jnp.asarray(fov_deg, Float))
    inv_tan = 1.0 / jnp.tan(fov / 2.0)
    persp = jnp.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, far / (far - near), -far * near / (far - near)],
        [0.0, 0.0, 1.0, 0.0],
    ], dtype=Float)
    m = _mm(jnp.diag(jnp.asarray([inv_tan, inv_tan, 1.0, 1.0], Float)), persp)
    return Transform(m, _inv(m))


def _apply(m: jnp.ndarray, v: jnp.ndarray, w: float) -> jnp.ndarray:
    """Apply the affine part of m to [...,3] with homogeneous coord w."""
    out = jnp.einsum("...ij,...j->...i", m[..., :3, :3], v, precision=jax.lax.Precision.HIGHEST)
    if w != 0.0:
        out = out + m[..., :3, 3]
        hw = jnp.einsum("...j,...j->...", m[..., 3, :3], v, precision=jax.lax.Precision.HIGHEST) + m[..., 3, 3]
        out = out / jnp.where(hw[..., None] == 0.0, 1.0, hw[..., None])
    return out


def transform_point(t: Transform, p: jnp.ndarray) -> jnp.ndarray:
    return _apply(t.m, p, 1.0)


def transform_vector(t: Transform, v: jnp.ndarray) -> jnp.ndarray:
    return _apply(t.m, v, 0.0)


def transform_normal(t: Transform, n: jnp.ndarray) -> jnp.ndarray:
    """Normals transform by the inverse transpose (transform.rs:133-139)."""
    return jnp.einsum("...ji,...j->...i", t.m_inv[..., :3, :3], n, precision=jax.lax.Precision.HIGHEST)


def transform_point_with_error(t: Transform, p: jnp.ndarray):
    """Transformed point plus conservative absolute error of the transform
    itself (reference tf_exact_to_err, transform.rs:181-211)."""
    pt = transform_point(t, p)
    abs_m = jnp.abs(t.m[..., :3, :])
    abs_term = jnp.einsum("...ij,...j->...i", abs_m[..., :3], jnp.abs(p)) + abs_m[..., 3]
    return pt, gamma(3) * abs_term


def transform_point_with_input_error(t: Transform, p: jnp.ndarray, p_err: jnp.ndarray):
    """Transformed point with propagated input error (tf_err_to_err,
    transform.rs:213-266)."""
    pt = transform_point(t, p)
    abs_m = jnp.abs(t.m[..., :3, :])
    err_in = (gamma(3) + 1.0) * jnp.einsum("...ij,...j->...i", abs_m[..., :3], p_err)
    abs_term = jnp.einsum("...ij,...j->...i", abs_m[..., :3], jnp.abs(p)) + abs_m[..., 3]
    return pt, err_in + gamma(3) * abs_term


def transform_vector_with_error(t: Transform, v: jnp.ndarray):
    vt = transform_vector(t, v)
    abs_m = jnp.abs(t.m[..., :3, :3])
    err = gamma(3) * jnp.einsum("...ij,...j->...i", abs_m, jnp.abs(v))
    return vt, err


# --- component-SoA (V3) variants for shared (unbatched [4,4]) transforms ---
# The wavefront hot path keeps vectors as three flat [N] arrays
# (core.vecmath.V3, zero tile padding); a shared camera/object matrix is 16
# scalars, so applying it is 9 fused multiply-adds per lane with no einsum.


def transform_point_v3(t: Transform, p):
    from fountain_tpu.core.vecmath import V3
    m = t.m
    x = m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3]
    y = m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3]
    z = m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3]
    hw = m[3, 0] * p.x + m[3, 1] * p.y + m[3, 2] * p.z + m[3, 3]
    inv = 1.0 / jnp.where(hw == 0.0, 1.0, hw)
    return V3(x * inv, y * inv, z * inv)


def transform_vector_v3(t: Transform, v):
    from fountain_tpu.core.vecmath import V3
    m = t.m
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)


def transform_normal_v3(t: Transform, n):
    """Normals transform by the inverse transpose (transform.rs:133-139)."""
    from fountain_tpu.core.vecmath import V3
    mi = t.m_inv
    return V3(mi[0, 0] * n.x + mi[1, 0] * n.y + mi[2, 0] * n.z,
              mi[0, 1] * n.x + mi[1, 1] * n.y + mi[2, 1] * n.z,
              mi[0, 2] * n.x + mi[1, 2] * n.y + mi[2, 2] * n.z)


def transform_point_with_error_v3(t: Transform, p):
    """V3 variant of tf_exact_to_err (transform.rs:181-211): returns
    (point, abs error) both V3."""
    from fountain_tpu.core.vecmath import V3
    pt = transform_point_v3(t, p)
    am = jnp.abs(t.m)
    ax, ay, az = jnp.abs(p.x), jnp.abs(p.y), jnp.abs(p.z)
    ex = am[0, 0] * ax + am[0, 1] * ay + am[0, 2] * az + am[0, 3]
    ey = am[1, 0] * ax + am[1, 1] * ay + am[1, 2] * az + am[1, 3]
    ez = am[2, 0] * ax + am[2, 1] * ay + am[2, 2] * az + am[2, 3]
    g = gamma(3)
    return pt, V3(g * ex, g * ey, g * ez)
