#!/usr/bin/env python
"""Capture an xplane trace of the bench step and print the top ops by
device time (the committed profile breakdown BASELINE.md requires)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_scene, RES, MAX_DEPTH
import os as _os
import fountain_tpu.integrator.path as P
from fountain_tpu.scene.camera import generate_rays
from fountain_tpu.core import rng


def main():
    res = RES
    scene, cam = build_scene(res, env_image=_os.environ.get("BENCH_ENV", "1") == "1")
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

    # BENCH_REGEN=1: profile the path-regeneration step (the bench
    # headline) instead of the fixed wave
    regen = _os.environ.get("BENCH_REGEN", "0") == "1"
    if regen:
        from bench import REGEN_ITERS

    @jax.jit
    def step(tv, seed):
        def loss_fn(tv):
            s = scene._replace(textures=scene.textures._replace(value=tv))
            if regen:
                def rf(lane_ids, sample_ids):
                    pxr = (lane_ids % res).astype(jnp.float32)
                    pyr = (lane_ids // res).astype(jnp.float32)
                    ur = rng.uniform4(lane_ids, sample_ids, P.DIM_CAMERA,
                                      seed)
                    rr = generate_rays(cam, pxr + ur[0], pyr + ur[1],
                                       ur[2], ur[3])
                    return rr.o, rr.d, jnp.zeros_like(pxr)
                out = P.trace_paths(s, o, d, lane, sample, cfg, seed=seed,
                                    regen_fn=rf, n_iters=REGEN_ITERS)
                nd = jnp.maximum(out.n_done.sum(), 1).astype(jnp.float32)
                return jnp.sum(out.accum.sum()) / (3.0 * nd)
            r = P.trace_paths(s, o, d, lane, sample, cfg, seed=seed)
            return (r.x + r.y + r.z).sum() / 3.0
        return jax.value_and_grad(loss_fn)(tv)

    out = step(tv, jnp.int32(1))
    jax.device_get(out)

    tdir = "/tmp/fountain_trace"
    with jax.profiler.trace(tdir):
        for i in range(2):
            out = step(tv, jnp.int32(i + 2))
        jax.device_get(jax.tree.leaves(out)[0])

    files = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
    assert files, "no trace written"
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device-lane events: aggregate wall duration by op name
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        # keep only device (TensorCore) ops: they carry run_id/hlo args
        if "run_id" in args or "hlo_category" in args or name.startswith(
                ("fusion", "custom-call", "sort", "scatter", "copy",
                 "dynamic", "while", "convert", "all-reduce", "reduce",
                 "transpose", "gather", "broadcast", "bitcast", "select",
                 "iota", "concatenate", "dot", "slice", "pad", "tuple")):
            cat = args.get("hlo_category", "")
            key = f"{name.split('.')[0]:>30s} [{cat}]"
            agg[key] += dur
            cnt[key] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total:.1f} ms (2 steps)")
    for k, v in rows[:30]:
        print(f"{k:40s} {v:9.2f} ms  x{cnt[k]}")


if __name__ == "__main__":
    main()
