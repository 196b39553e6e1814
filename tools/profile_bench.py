#!/usr/bin/env python
"""Time decomposition of the bench step: localize where 4.2 s/step goes.

Times, on the real chip, each suspect in isolation:
  - one Pallas intersect sweep (262k rays x 4332 faces)
  - one argsort of 262k keys (+ inverse scatter)
  - forward-only trace_paths
  - fwd+bwd step (the bench workload)
  - gather_shading alone
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")
from bench import build_scene, RES, MAX_DEPTH  # noqa: E402

from fountain_tpu.integrator.path import PathConfig, trace_paths, DIM_CAMERA  # noqa: E402
from fountain_tpu.scene.camera import generate_rays  # noqa: E402
from fountain_tpu.core import rng  # noqa: E402


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    res = RES
    scene, cam = build_scene(res)
    n = res * res
    cfg = PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)

    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, 0)
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    o, d = rays.o, rays.d
    sample = jnp.zeros((n,), jnp.int32)

    # --- one pallas sweep
    from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas, sort_keys
    t_max = jnp.full((n,), jnp.inf)
    active = jnp.ones((n,), bool)

    @jax.jit
    def one_sweep(o, d, t_max):
        return mt_intersect_pallas(scene.tri_qfeat, o, d, t_max, active=active)

    @jax.jit
    def one_sweep_nosort(o, d, t_max):
        return mt_intersect_pallas(scene.tri_qfeat, o, d, t_max, sort=False)

    dt = timeit(one_sweep, o, d, t_max)
    print(f"pallas sweep (sorted):   {dt*1e3:8.2f} ms")
    dt = timeit(one_sweep_nosort, o, d, t_max)
    print(f"pallas sweep (nosort):   {dt*1e3:8.2f} ms")

    # --- argsort alone
    @jax.jit
    def do_sort(o, d):
        key = sort_keys(o, d)
        perm = jnp.argsort(key)
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n))
        return perm, inv

    dt = timeit(do_sort, o, d)
    print(f"argsort+inv (262k):      {dt*1e3:8.2f} ms")

    # --- gather_shading alone
    from fountain_tpu.geometry.intersect import scene_intersect
    from fountain_tpu.shading.bsdf import gather_shading

    @jax.jit
    def isect_only(o, d):
        return scene_intersect(scene, o, d, t_max, active=active)

    hit = isect_only(o, d)
    jax.block_until_ready(hit)
    dt = timeit(isect_only, o, d)
    print(f"scene_intersect+hitinfo: {dt*1e3:8.2f} ms")

    @jax.jit
    def shade_only(hit):
        return gather_shading(scene, hit, tex_width=jnp.zeros((n,)))

    dt = timeit(shade_only, hit)
    print(f"gather_shading:          {dt*1e3:8.2f} ms")

    # --- forward only
    def wave_radiance(scene, seed):
        return trace_paths(scene, o, d, lane, sample, cfg, seed=seed)

    @jax.jit
    def fwd(scene, seed):
        return jnp.mean(wave_radiance(scene, seed).sum())

    dt = timeit(fwd, scene, jnp.int32(1), n=4)
    print(f"forward trace_paths:     {dt*1e3:8.2f} ms")

    # --- fwd+bwd
    @jax.jit
    def step(tv, scene, seed):
        def loss_fn(tv):
            s = scene._replace(textures=scene.textures._replace(value=tv))
            return jnp.mean(wave_radiance(s, seed).sum())
        return jax.value_and_grad(loss_fn)(tv)

    dt = timeit(step, scene.textures.value, scene, jnp.int32(1), n=4)
    print(f"fwd+bwd step:            {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
