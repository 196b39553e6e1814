#!/usr/bin/env python
"""Isolate Pallas per-grid-step overhead on this backend."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl

REPS = 8


def timeit(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return dt


def main():
    d = jax.devices()[0]
    print(f"platform={d.platform} kind={getattr(d, 'device_kind', '?')}")

    N, BN = 262144, 512
    n_tiles = N // BN
    x = jnp.ones((n_tiles, 8, BN), jnp.float32)

    # 1. trivial kernel, grid=(n_tiles,)
    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def trivial_g(g):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                k_copy,
                grid=(g,),
                in_specs=[pl.BlockSpec((1, 8, BN), lambda i: (i % n_tiles, 0, 0))],
                out_specs=pl.BlockSpec((1, 8, BN), lambda i: (i % n_tiles, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((n_tiles, 8, BN), jnp.float32),
            )(x)
        return run
    for g in (64, 512, 1024):
        timeit(f"trivial copy grid=({g},)", trivial_g(g), x)

    # 3. one bf16 dot per step (the sweep's block shape)
    K6, BC = 96, 512
    rf = jnp.ones((n_tiles, BN, K6), jnp.bfloat16)
    ft = jnp.ones((K6, BC), jnp.bfloat16)

    def k_dotn(nd):
        def k(rf_ref, ft_ref, o_ref):
            acc = jnp.full((BN, BC), 3e38, jnp.float32)
            for _ in range(nd):
                r = jax.lax.dot_general(
                    rf_ref[0], ft_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = jnp.minimum(acc, r)
            o_ref[...] = jnp.min(acc, axis=1, keepdims=True)[:, 0][None, :]
        return k

    def dotn(nd):
        @jax.jit
        def run(rf, ft):
            return pl.pallas_call(
                k_dotn(nd),
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((1, BN, K6), lambda i: (i, 0, 0)),
                          pl.BlockSpec((K6, BC), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((1, BN), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((n_tiles, BN), jnp.float32),
            )(rf, ft)
        return run
    timeit("1 dot/step grid=(512,)", dotn(1), rf, ft)
    timeit("8 dots/step grid=(512,)", dotn(8), rf, ft)
    timeit("32 dots/step grid=(512,)", dotn(32), rf, ft)

    # 5. XLA pure-dot reference
    A = jnp.ones((N, K6), jnp.bfloat16)
    B = jnp.ones((K6, 4352), jnp.bfloat16)

    @jax.jit
    def xla_dot(A, B):
        return jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).min(1)
    timeit("XLA [262144,96]@[96,4352] bf16 +min", xla_dot, A, B)

    @jax.jit
    def xla_dot2(A, B):
        r = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.min(r, axis=1), jnp.argmin(r, axis=1)
    timeit("XLA same + argmin", xla_dot2, A, B)

    # 6. cond/fori overhead
    def k_cond(x_ref, o_ref):
        def body(c, acc):
            return jax.lax.cond(jnp.any(x_ref[0, 0] > c),
                                lambda a: a + 1.0, lambda a: a, acc)
        acc = jax.lax.fori_loop(0, 16, body, jnp.zeros((), jnp.float32))
        o_ref[...] = x_ref[...] + acc

    @jax.jit
    def condk(x):
        return pl.pallas_call(
            k_cond,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, 8, BN), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, BN), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, BN), jnp.float32),
        )(x)
    timeit("16x cond/fori grid=(512,)", condk, x)


if __name__ == "__main__":
    main()
