"""Counter-based deterministic RNG for wavefront path tracing.

The reference threads a mutable Xoshiro256+ sampler through each tile,
reseeded per tile id so parallel rendering is deterministic
(src/sampler/random.rs:6-76, src/integrator/mod.rs:182-185). On TPU, the
natively-batched equivalent is a *stateless counter-based hash*: every
random number is a pure function of (lane/pixel id, sample index, dimension
index, stream seed). This gives:

- determinism independent of batch partitioning → results invariant to
  the number of chips (same property the reference gets via per-tile seeds),
- exact checkpoint/resume by sample counter (the reference reserved
  ``set_sample_number`` for this but left it unimplemented,
  src/sampler/mod.rs:53),
- a handful of integer VPU ops per number, no carried RNG state.

The hash is PCG4D (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020) — a widely used, statistically solid choice for MC rendering.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg4d(a, b, c, d):
    """PCG4D hash: 4 x uint32 in -> 4 x uint32 out (well mixed)."""
    x = jnp.asarray(a).astype(_U32)
    y = jnp.asarray(b).astype(_U32)
    z = jnp.asarray(c).astype(_U32)
    w = jnp.asarray(d).astype(_U32)
    mul = _U32(1664525)
    add = _U32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    w = w * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit_float(u):
    """uint32 -> f32 in [0, 1): top 24 bits scaled by 2^-24 (exact)."""
    return (u >> _U32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)


def uniform4(lane, sample, dim, seed=0):
    """Four independent U[0,1) floats for (lane, sample, dim, seed).

    All args are int arrays (broadcastable); returns a tuple of 4 float
    arrays of the broadcast shape.
    """
    x, y, z, w = pcg4d(lane, sample, dim, seed)
    return (_to_unit_float(x), _to_unit_float(y),
            _to_unit_float(z), _to_unit_float(w))


def uniform1(lane, sample, dim, seed=0):
    return uniform4(lane, sample, dim, seed)[0]


def uniform2(lane, sample, dim, seed=0):
    u = uniform4(lane, sample, dim, seed)
    return u[0], u[1]
