#!/usr/bin/env python
"""Count expensive op classes in the compiled fwd+bwd step HLO: are the
intersection sweeps / sorts re-executed in the backward pass?"""
import re
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_scene, RES, MAX_DEPTH
from fountain_tpu.integrator.path import PathConfig, trace_paths, DIM_CAMERA
from fountain_tpu.scene.camera import generate_rays
from fountain_tpu.core import rng


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
    cfg = PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)

    def step(tv, seed):
        def loss_fn(tv):
            s = scene._replace(textures=scene.textures._replace(value=tv))
            r = trace_paths(s, o, d, lane, sample, cfg, seed=seed)
            return (r.x + r.y + r.z).sum() / 3.0
        return jax.value_and_grad(loss_fn)(tv)

    lowered = jax.jit(step).lower(scene.textures.value, jnp.int32(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    for pat in (r"custom-call", r'"sort', r"sort\(", r"scatter",
                r"gather\(", r"while", r"tpu_custom_call"):
        print(f"{pat:20s} {len(re.findall(pat, txt))}")
    # memory + flops stats if available
    try:
        an = compiled.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        for k in ("flops", "bytes accessed", "transcendentals"):
            if k in an:
                print(f"{k}: {an[k]:.3e}")
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    main()
