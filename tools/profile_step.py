#!/usr/bin/env python
"""Per-phase timing of the bench step: localize where the 4s/step goes."""
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
from fountain_tpu.core.vecmath import V3
from fountain_tpu.geometry.intersect import scene_intersect

REPS = 4


def timeit(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:40s} {dt*1e3:10.1f} ms")
    return dt


def main():
    res = RES
    scene, cam = build_scene(res)
    n = res * res
    cfg = PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)

    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, jnp.int32(0))
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    sample = jnp.zeros((n,), jnp.int32)
    o, d = rays.o, rays.d
    jax.block_until_ready((o.x, d.x))
    print(f"device={jax.devices()[0].platform} n={n}")

    # 1. one full-wave closest-hit sweep
    @jax.jit
    def sweep(o, d):
        t_max = jnp.full((n,), jnp.inf)
        h = scene_intersect(scene, o, d, t_max,
                            active=jnp.ones((n,), bool))
        return h.t, h.prim_id

    timeit("closest-hit sweep (full wave)", sweep, o, d)

    # 1b. sweep without sort
    @jax.jit
    def sweep_nosort(o, d):
        from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
        t, idx, found = mt_intersect_pallas(
            scene.tri_qfeat, o, d, jnp.full((n,), jnp.inf), sort=False)
        return t, idx

    try:
        timeit("raw pallas sweep (no sort)", sweep_nosort, o, d)
    except Exception as e:
        print("no-sort sweep failed:", e)

    @jax.jit
    def sweep_sort(o, d):
        from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
        t, idx, found = mt_intersect_pallas(
            scene.tri_qfeat, o, d, jnp.full((n,), jnp.inf), sort=True)
        return t, idx

    try:
        timeit("raw pallas sweep (sorted)", sweep_sort, o, d)
    except Exception as e:
        print("sorted sweep failed:", e)

    # 2. forward-only trace
    @jax.jit
    def fwd(o, d, seed):
        return trace_paths(scene, o, d, lane, sample, cfg, seed=seed)

    timeit("forward trace_paths", fwd, o, d, jnp.int32(1))

    # 3. fwd+bwd
    @jax.jit
    def step(tv, seed):
        def loss_fn(tv):
            s = scene._replace(textures=scene.textures._replace(value=tv))
            r = trace_paths(s, o, d, lane, sample, cfg, seed=seed)
            return (r.x + r.y + r.z).sum() / 3.0
        return jax.value_and_grad(loss_fn)(tv)

    timeit("fwd+bwd step", step, scene.textures.value, jnp.int32(1))


if __name__ == "__main__":
    main()
