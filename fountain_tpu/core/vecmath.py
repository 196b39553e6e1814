"""Batched 3-vector math and floating-point error bounds.

TPU-native analog of the reference's L0 math core:
``src/math.rs``, ``src/geometry/mod.rs``, ``src/err_float.rs``.

All functions operate on ``jnp`` arrays whose *last* axis is the component
axis (shape ``[..., 3]`` for vectors/points/normals, ``[..., 2]`` for 2D).
There are no Point/Vector/Normal wrapper types: the distinction only matters
at transform time (reference src/geometry/transform.rs:117-139), where the
caller picks `transform_point` / `transform_vector` / `transform_normal`.

Error-bound machinery (`gamma`, `offset_ray_origin`) follows the running
floating-point error analysis of the reference (src/err_float.rs:7-30,
src/geometry/mod.rs:72-85); it is what makes shadow/secondary rays robust
without a fixed scene-scale epsilon.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Float = jnp.float32


class V3(NamedTuple):
    """Wavefront 3-vector in component-SoA layout: three flat [N] arrays.

    THE load-bearing TPU design decision of this framework: XLA tiles f32
    arrays as (8 sublanes, 128 lanes) over the last two axes, so a
    materialized [N, 3] wavefront array pads 42.7x (and [N, 1] 128x) in
    HBM — measured as ~85% of the entire render step's runtime in round 2.
    Three flat [N] arrays tile perfectly (zero padding), every elementwise
    op is a clean VPU op, and scan carries need no packing. The reference
    has no analog (CPU SoA in Rust, src/shapes/triangle.rs:10-26, has no
    tile-padding hazard).

    Supports +, -, unary -, * (V3*V3 componentwise, V3*scalar scales),
    /, so spectrum math (`f * absdot(wi, ns) / pdf`) reads naturally.
    """
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    @property
    def shape(self):
        return jnp.shape(self.x)

    def stack(self, axis=-1) -> jnp.ndarray:
        """Boundary conversion to a dense [..., 3] array (film/IO only)."""
        return jnp.stack(jnp.broadcast_arrays(
            jnp.asarray(self.x, Float), jnp.asarray(self.y, Float),
            jnp.asarray(self.z, Float)), axis=axis)

    def broadcast_to(self, shape) -> "V3":
        return V3(*(jnp.broadcast_to(jnp.asarray(c, Float), shape)
                    for c in self))

    def astype(self, dt) -> "V3":
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))

    def max_component(self):
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def sum(self):
        return self.x + self.y + self.z

    def abs(self) -> "V3":
        return V3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def isfinite(self):
        return (jnp.isfinite(self.x) & jnp.isfinite(self.y)
                & jnp.isfinite(self.z))

    def any_positive(self):
        return (self.x > 0.0) | (self.y > 0.0) | (self.z > 0.0)

    def any_nonzero(self):
        return (self.x != 0.0) | (self.y != 0.0) | (self.z != 0.0)


def v3(x, y, z) -> V3:
    """Component-SoA vector from scalars/arrays (broadcastable)."""
    return V3(jnp.asarray(x, Float), jnp.asarray(y, Float),
              jnp.asarray(z, Float))


def v3_from(arr) -> V3:
    """V3 from a [..., 3] array (boundary conversion)."""
    arr = jnp.asarray(arr, Float)
    return V3(arr[..., 0], arr[..., 1], arr[..., 2])


def zeros3(shape=()) -> V3:
    z = jnp.zeros(shape, Float)
    return V3(z, z, z)


def full3(shape, cx, cy=None, cz=None) -> V3:
    if cy is None:
        cy = cz = cx
    return V3(jnp.full(shape, cx, Float), jnp.full(shape, cy, Float),
              jnp.full(shape, cz, Float))


def where3(mask, a, b) -> V3:
    """Per-lane select between V3s (mask [N]; a/b V3 or scalar)."""
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.where(mask, ax, bx), jnp.where(mask, ay, by),
              jnp.where(mask, az, bz))

# Machine epsilon / 2 for f32 (= 2^-24), as used by the reference error
# bounds (src/err_float.rs:7-10).
MACHINE_EPSILON = 2.0 ** -24
# Shadow-ray clipping epsilon (reference src/interaction.rs:10).
SHADOW_EPSILON = 1e-4
INFINITY = float("inf")  # plain float: no backend init at import
PI = 3.14159265358979323846
INV_PI = 1.0 / PI
INV_2PI = 1.0 / (2.0 * PI)
INV_4PI = 1.0 / (4.0 * PI)
PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0


def gamma(n) -> float:
    """Conservative relative error bound for n chained fp ops.

    gamma(n) = n*eps / (1 - n*eps)  (reference src/err_float.rs:7-10).
    Accepts python ints (static) — returns a python float usable as a
    compile-time constant.
    """
    ne = n * MACHINE_EPSILON
    return ne / (1.0 - ne)


def dot(a, b) -> jnp.ndarray:
    """Dot product (V3 pairs, or arrays over the trailing axis)."""
    if isinstance(a, V3):
        return a.x * b.x + a.y * b.y + a.z * b.z
    return jnp.sum(a * b, axis=-1)


def absdot(a, b) -> jnp.ndarray:
    return jnp.abs(dot(a, b))


def cross(a, b):
    if isinstance(a, V3):
        return V3(a.y * b.z - a.z * b.y,
                  a.z * b.x - a.x * b.z,
                  a.x * b.y - a.y * b.x)
    return jnp.cross(a, b)


def length_sq(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(v))


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def distance_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length_sq(a - b)


def normalize(v, eps: float = 0.0):
    """Normalize (V3 or trailing-axis array). ``eps`` guards 0-length."""
    len2 = length_sq(v)
    inv = jnp.where(len2 > eps,
                    jnp.reciprocal(jnp.sqrt(jnp.maximum(len2, 1e-30))), 0.0)
    if isinstance(v, V3):
        return v * inv
    return v * inv[..., None]


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def vec(x, y, z) -> jnp.ndarray:
    """Stack components into a [..., 3] vector."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, Float), jnp.asarray(y, Float), jnp.asarray(z, Float)), axis=-1)


def coordinate_system(v1):
    """Build an orthonormal basis (v1, v2, v3) from a unit vector v1.

    Branch-free batched version of reference src/geometry/mod.rs:53-62
    (which branches on |x|>|y|): both candidate tangents are computed and
    selected with `where`, the natural TPU formulation.
    """
    if isinstance(v1, V3):
        x, y, z = v1
        use_x = jnp.abs(x) > jnp.abs(y)
        inv_a = jnp.reciprocal(jnp.sqrt(
            jnp.where(use_x, x * x + z * z, y * y + z * z)))
        zero = jnp.zeros_like(x)
        v2 = where3(use_x, V3(-z * inv_a, zero, x * inv_a),
                    V3(zero, z * inv_a, -y * inv_a))
        return v1, v2, cross(v1, v2)
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    use_x = jnp.abs(x) > jnp.abs(y)
    inv_a = jnp.reciprocal(jnp.sqrt(jnp.where(use_x, x * x + z * z, y * y + z * z)))
    v2 = jnp.where(
        use_x[..., None],
        vec(-z * inv_a, jnp.zeros_like(x), x * inv_a),
        vec(jnp.zeros_like(x), z * inv_a, -y * inv_a),
    )
    v3 = cross(v1, v2)
    return v1, v2, v3


def face_forward(n, v):
    """Flip n so it lies in the same hemisphere as v."""
    if isinstance(n, V3):
        return where3(dot(n, v) < 0.0, -n, n)
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def reflect(wo, n):
    """Mirror direction about n (both point away from surface).

    Reference src/reflection/mod.rs (reflect helper): -wo + 2 (wo.n) n.
    """
    if isinstance(wo, V3):
        return -wo + n * (2.0 * dot(wo, n))
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Refract wi about n with relative IOR eta = eta_i/eta_t.

    Returns (wt, valid) where valid=False marks total internal reflection.
    Behavioral parity with the reference's refract helper
    (src/reflection/mod.rs:200-250 SpecularTransmission path).
    """
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i)
    sin2_theta_t = eta * eta * sin2_theta_i
    valid = sin2_theta_t < 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_t))
    if isinstance(wi, V3):
        wt = (-wi) * eta + n * (eta * cos_theta_i - cos_theta_t)
    else:
        wt = eta[..., None] * -wi \
            + (eta * cos_theta_i - cos_theta_t)[..., None] * n
    return wt, valid


def spherical_direction(sin_theta, cos_theta, phi) -> V3:
    return V3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
              jnp.broadcast_to(jnp.asarray(cos_theta, Float),
                               jnp.shape(sin_theta * jnp.cos(phi))))


def spherical_theta(v) -> jnp.ndarray:
    z = v.z if isinstance(v, V3) else v[..., 2]
    return jnp.arccos(jnp.clip(z, -1.0, 1.0))


def spherical_phi(v) -> jnp.ndarray:
    if isinstance(v, V3):
        p = jnp.arctan2(v.y, v.x)
    else:
        p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * PI, p)


@jax.custom_jvp
def next_float_up(x: jnp.ndarray) -> jnp.ndarray:
    # custom_jvp with identity tangent: nextafter has no JVP rule in JAX,
    # and its true derivative is 1 almost everywhere (piecewise-identity
    # ulp bump). A stop_gradient wrapper is NOT enough — the primitive is
    # still traced with a JVP tracer inside and raises NotImplementedError.
    return jnp.nextafter(x, jnp.asarray(jnp.inf, x.dtype))


@next_float_up.defjvp
def _next_float_up_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return next_float_up(x), t


@jax.custom_jvp
def next_float_down(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.nextafter(x, jnp.asarray(-jnp.inf, x.dtype))


@next_float_down.defjvp
def _next_float_down_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return next_float_down(x), t


def offset_ray_origin(p, p_err, n, w):
    """Offset a spawned ray's origin along the normal past the error bound.

    Conservative self-intersection avoidance: move the origin out of the
    error box around p along ±n (sign chosen towards w), then round each
    component away from p (reference src/geometry/mod.rs:72-85).
    """
    if isinstance(p, V3):
        d = dot(n.abs(), p_err)
        offset = n * jnp.where(dot(w, n) < 0.0, -d, d)

        def bump(po, off):
            return jnp.where(off > 0.0, next_float_up(po),
                             jnp.where(off < 0.0, next_float_down(po), po))
        po = p + offset
        return V3(bump(po.x, offset.x), bump(po.y, offset.y),
                  bump(po.z, offset.z))
    d = dot(jnp.abs(n), p_err)
    offset = d[..., None] * n
    offset = jnp.where(dot(w, n)[..., None] < 0.0, -offset, offset)
    po = p + offset
    po = jnp.where(offset > 0.0, next_float_up(po),
                   jnp.where(offset < 0.0, next_float_down(po), po))
    return po


def quadratic(a, b, c):
    """Stable quadratic roots (t0 <= t1) with a validity mask.

    Batched, branch-free version of reference src/math.rs:36-53 (citardauq
    form: the root with cancellation risk is computed as c/q). The reference
    solves in EFloat interval arithmetic; here plain f32, and hot callers
    (sphere intersect) additionally use the geometric rearrangement that
    avoids catastrophic cancellation in the discriminant.
    """
    disc = b * b - 4.0 * a * c
    valid = (disc >= 0.0) & (a != 0.0)
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return lo, hi, valid


def solve_linear_system_2x2(a00, a01, a10, a11, b0, b1):
    """Solve a 2x2 linear system; returns (x0, x1, valid).

    Batched analog of reference src/math.rs:56-72 (used for texture
    differentials, src/interaction.rs:123-173).
    """
    det = a00 * a11 - a01 * a10
    valid = jnp.abs(det) >= 1e-10
    safe = jnp.where(valid, det, 1.0)
    x0 = (a11 * b0 - a01 * b1) / safe
    x1 = (a00 * b1 - a10 * b0) / safe
    ok = valid & jnp.isfinite(x0) & jnp.isfinite(x1)
    return x0, x1, ok
