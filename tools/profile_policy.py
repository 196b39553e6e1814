#!/usr/bin/env python
"""Time the fwd+bwd step under different remat save policies."""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_scene, RES, MAX_DEPTH
import fountain_tpu.integrator.path as P
from fountain_tpu.scene.camera import generate_rays
from fountain_tpu.core import rng

REPS = 4


def main():
    res = RES
    scene, cam = build_scene(res)
    n = res * res
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, P.DIM_CAMERA, jnp.int32(0))
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    sample = jnp.zeros((n,), jnp.int32)
    o, d = rays.o, rays.d
    cfg = P.PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)
    tv = scene.textures.value
    print(f"device={jax.devices()[0].platform} n={n}", flush=True)

    def run(name, save_names):
        jax.clear_caches()
        P._CKPT_SAVE_NAMES = save_names

        @jax.jit
        def step(tv, seed):
            def loss_fn(tv):
                s = scene._replace(
                    textures=scene.textures._replace(value=tv))
                r = P.trace_paths(s, o, d, lane, sample, cfg, seed=seed)
                return (r.x + r.y + r.z).sum() / 3.0
            return jax.value_and_grad(loss_fn)(tv)

        try:
            out = step(tv, jnp.int32(1))
            jax.device_get(out)
            t0 = time.time()
            for _ in range(REPS):
                out = step(tv, jnp.int32(1))
                jax.device_get(jax.tree.leaves(out)[0])
            dt = (time.time() - t0) / REPS
            print(f"{name:36s} {dt*1e3:10.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {e}", flush=True)

    run("save isect only (round-3)", ("isect",))
    run("save isect + nee", ("isect", "nee"))
    run("save isect + nee + shade", ("isect", "nee", "shade"))


if __name__ == "__main__":
    main()
