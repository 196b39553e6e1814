#!/usr/bin/env python
"""Cost structure of the Pallas sweep: fixed overhead vs per-work cost."""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from fountain_tpu.geometry.pallas_tri import (pack_features_pallas,
                                              mt_intersect_pallas, _sweep, BN)
from fountain_tpu.core.vecmath import V3

REPS = 8


def timeit(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:46s} {dt*1e3:9.2f} ms")
    return dt


def make_tris(f, scale=10.0, seed=0):
    r = np.random.RandomState(seed)
    c = (r.rand(f, 1, 3) - 0.5) * scale
    tri = c + (r.rand(f, 3, 3) - 0.5) * 0.5
    return tri.astype(np.float32)


def make_rays(n, scale=10.0, seed=1):
    r = np.random.RandomState(seed)
    o = jnp.asarray((r.rand(n, 3) - 0.5) * scale * 2, jnp.float32)
    d = r.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    return V3(o[:, 0], o[:, 1], o[:, 2]), V3(d[:, 0], d[:, 1], d[:, 2])


def main():
    print(f"device={jax.devices()[0].platform}")
    for f in (512, 4332, 16384):
        q = pack_features_pallas(make_tris(f))
        for n in (65536, 262144):
            o, d = make_rays(n)
            t_max = jnp.full((n,), jnp.inf)

            @jax.jit
            def go(o, d, t_max):
                return mt_intersect_pallas(q, o, d, t_max, sort=False)

            timeit(f"F={f:6d} N={n:7d} incoherent nosort", go, o, d, t_max)

    # coherent rays (camera-like): same origin, forward cone
    f = 4332
    q = pack_features_pallas(make_tris(f))
    n = 262144
    r = np.random.RandomState(2)
    o_np = np.tile(np.array([[30.0, 0, 0]], np.float32), (n, 1))
    d_np = np.concatenate([-np.ones((n, 1)), 0.3 * (r.rand(n, 2) - .5)], 1)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o = V3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = V3(*[jnp.asarray(d_np[:, i].astype(np.float32)) for i in range(3)])
    t_max = jnp.full((n,), jnp.inf)

    @jax.jit
    def go2(o, d, t_max):
        return mt_intersect_pallas(q, o, d, t_max, sort=False)
    timeit(f"F={f} N={n} coherent nosort", go2, o, d, t_max)

    # all-dead wave: measures pure grid/launch overhead
    @jax.jit
    def go3(o, d):
        return mt_intersect_pallas(q, o, d, jnp.full((n,), -1.0),
                                   sort=False,
                                   active=jnp.zeros((n,), bool))
    timeit(f"F={f} N={n} all-dead (overhead)", go3, o, d)

    # sort cost alone
    @jax.jit
    def go4(o, d, t_max):
        return mt_intersect_pallas(q, o, d, t_max, sort=True)
    timeit(f"F={f} N={n} incoherent sorted", go4, *make_rays(n), t_max)


if __name__ == "__main__":
    main()
