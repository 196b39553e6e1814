#!/usr/bin/env python
"""Localize the backward-pass cost of the bench step.

Round-3 measurement: fwd 142 ms, fwd+bwd 687 ms (4.8x) at 512^2 depth 5.
This script times fwd+bwd under varying remat policies / path configs to
find where the ~545 ms of backward goes.
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_scene, RES, MAX_DEPTH
from fountain_tpu.integrator.path import PathConfig, trace_paths, DIM_CAMERA
from fountain_tpu.scene.camera import generate_rays
from fountain_tpu.core import rng

REPS = 4


def timeit(name, fn, *a):
    out = fn(*a)
    jax.device_get(out)  # force full device->host completion (axon's
    # block_until_ready can resolve at enqueue for cached executions)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1e3:10.1f} ms", flush=True)
    return dt


def main():
    res = RES
    scene, cam = build_scene(res)
    n = res * res

    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, jnp.int32(0))
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    sample = jnp.zeros((n,), jnp.int32)
    o, d = rays.o, rays.d
    jax.block_until_ready((o.x, d.x))
    print(f"device={jax.devices()[0].platform} n={n}", flush=True)

    def make_step(cfg):
        @jax.jit
        def step(tv, seed):
            def loss_fn(tv):
                s = scene._replace(
                    textures=scene.textures._replace(value=tv))
                r = trace_paths(s, o, d, lane, sample, cfg, seed=seed)
                return (r.x + r.y + r.z).sum() / 3.0
            return jax.value_and_grad(loss_fn)(tv)
        return step

    def make_fwd(cfg):
        @jax.jit
        def fwd(seed):
            return trace_paths(scene, o, d, lane, sample, cfg, seed=seed)
        return fwd

    tv = scene.textures.value
    base = PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)

    timeit("fwd  depth5 nee", make_fwd(base), jnp.int32(1))
    timeit("step depth5 nee", make_step(base), tv, jnp.int32(1))
    timeit("fwd  depth5 nee=off",
           make_fwd(base._replace(nee=False, emit_all_bounces=True)),
           jnp.int32(1))
    timeit("step depth5 nee=off",
           make_step(base._replace(nee=False, emit_all_bounces=True)),
           tv, jnp.int32(1))
    timeit("step depth2 nee", make_step(base._replace(max_depth=2)),
           tv, jnp.int32(1))
    timeit("step depth0 nee", make_step(base._replace(max_depth=0)),
           tv, jnp.int32(1))


if __name__ == "__main__":
    main()
