#!/usr/bin/env python
"""Microbenchmarks of the TPU primitives the render loop leans on:
argsort, permute-gather, scatter, row-gather styles for hit_info."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N = 512 * 512
F = 4332


def timeit(fn, *args, n=16, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    x = jnp.asarray(rng.normal(size=N).astype(np.float32))
    xs7 = [jnp.asarray(rng.normal(size=N).astype(np.float32))
           for _ in range(7)]
    fidx = jnp.asarray(rng.integers(0, F, N, dtype=np.int32))
    attr27 = jnp.asarray(rng.normal(size=(27, F)).astype(np.float32))
    attr32 = jnp.asarray(rng.normal(size=(F, 32)).astype(np.float32))
    attr8x = jnp.asarray(rng.normal(size=(F, 8, 4)).astype(np.float32))

    print(f"argsort i32 [{N}]:        "
          f"{timeit(jax.jit(jnp.argsort), key)*1e3:8.2f} ms")

    @jax.jit
    def permute1(x, perm):
        return x[perm]
    print(f"gather x[perm] 1 arr:     {timeit(permute1, x, perm)*1e3:8.2f} ms")

    @jax.jit
    def permute7(xs, perm):
        return [a[perm] for a in xs]
    print(f"gather x[perm] 7 arrs:    {timeit(permute7, xs7, perm)*1e3:8.2f} ms")

    @jax.jit
    def inv_perm(perm):
        return jnp.zeros_like(perm).at[perm].set(
            jnp.arange(N, dtype=jnp.int32))
    print(f"scatter inv-perm:         {timeit(inv_perm, perm)*1e3:8.2f} ms")

    @jax.jit
    def scatter_add(x, perm):
        return jnp.zeros_like(x).at[perm].add(x)
    print(f"scatter-add [N]:          {timeit(scatter_add, x, perm)*1e3:8.2f} ms")

    @jax.jit
    def g27(attr, fidx):
        return [attr[k, fidx] for k in range(27)]
    print(f"27x row-gather [27,F]:    {timeit(g27, attr27, fidx)*1e3:8.2f} ms")

    @jax.jit
    def g32(attr, fidx):
        return attr[fidx]            # [N, 32]
    print(f"1x row-gather [F,32]:     {timeit(g32, attr32, fidx)*1e3:8.2f} ms")

    @jax.jit
    def g32s(attr, fidx):
        r = attr[fidx]               # [N, 32]
        return [r[:, k] for k in range(27)]  # split to flat [N] components
    print(f"row-gather+split 27:      {timeit(g32s, attr32, fidx)*1e3:8.2f} ms")

    @jax.jit
    def g8x4(attr, fidx):
        r = attr[fidx]               # [N, 8, 4]
        return [r[:, k // 4, k % 4] for k in range(27)]
    print(f"row-gather [F,8,4]+split: {timeit(g8x4, attr8x, fidx)*1e3:8.2f} ms")

    # take_along_axis formulation of the 27-row gather
    @jax.jit
    def g27t(attr, fidx):
        idx = jnp.broadcast_to(fidx[None, :], (27, N))
        return jnp.take_along_axis(attr, idx, axis=1)
    print(f"take_along [27,F]->[27,N]:{timeit(g27t, attr27, fidx)*1e3:8.2f} ms")

    # sort-free alternative: is a full 27xF one-hot matmul viable? F small.
    @jax.jit
    def gmat(attr, fidx):
        oh = jax.nn.one_hot(fidx, F, dtype=jnp.bfloat16)   # [N, F]
        return jnp.matmul(oh, attr.T.astype(jnp.bfloat16))  # [N, 27]
    print(f"one-hot matmul [N,F]x27:  {timeit(gmat, attr27, fidx)*1e3:8.2f} ms")


if __name__ == "__main__":
    sys.exit(main())
