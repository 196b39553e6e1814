"""`render` CLI: parse a .pbrt scene, render, write EXR/PNG.

TPU-native analog of reference ``src/bin/render.rs``:
  python -m fountain_tpu.cli.render scene.pbrt [-o out.exr] [--samples N]

The reference's `-t/--threads` flag has no analog (parallelism is the
device mesh); `--devices` shards across available chips instead.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fountain-tpu render")
    ap.add_argument("scene", help="PBRT scene file")
    ap.add_argument("-o", "--output", default=None,
                    help="output image (.exr/.png); default from Film stmt")
    ap.add_argument("--samples", type=int, default=None,
                    help="override samples per pixel (render.rs:28-29)")
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard the render across N devices")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler (xprof) trace of the "
                         "render into DIR (reference tracing hooks: "
                         "src/bin/render.rs:35-36)")
    ap.add_argument("--progress", action="store_true",
                    help="render in sample chunks and print live paths/s "
                         "(reference indicatif bar, integrator/mod.rs:"
                         "187-191; uses the resumable render_samples)")
    ap.add_argument("--regen", action="store_true",
                    help="path-regeneration waves (occupancy-optimal; box "
                         "filter): dead lanes immediately start their "
                         "pixel's next sample — ~3x throughput at equal "
                         "quality; spp becomes a per-pixel average")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.io.image import save_image
    from fountain_tpu.io.pbrt import load_pbrt
    from fountain_tpu.scene.film import (FILTER_BOX, FILTER_GAUSSIAN,
                                         FILTER_TRIANGLE)

    t0 = time.time()
    scene, camera, st = load_pbrt(args.scene)
    print(f"scene loaded in {time.time() - t0:.2f}s: "
          f"{scene.spheres.count} spheres, {scene.triangles.count} tris, "
          f"{scene.lights.count} lights", file=sys.stderr)

    spp = args.samples or st.spp
    max_depth = args.max_depth or st.max_depth
    nee = st.integrator != "bsdf"
    mode = {"directlighting": "direct", "whitted": "whitted"}.get(
        st.integrator, "path")
    cfg = PathConfig(max_depth=max_depth, rr_threshold=1.0, nee=nee,
                     mode=mode)
    ftype = {"box": FILTER_BOX, "triangle": FILTER_TRIANGLE,
             "gaussian": FILTER_GAUSSIAN}.get(st.filter_name, FILTER_BOX)

    if args.regen:
        if args.devices > 1 or args.progress:
            print("warning: --regen ignores --devices/--progress",
                  file=sys.stderr)
        if ftype != FILTER_BOX:
            print("warning: --regen uses the box filter", file=sys.stderr)
        from fountain_tpu.integrator.path import trace_paths  # noqa: F401
        from fountain_tpu.integrator.render import render_regen
        from fountain_tpu.scene.film import finalize

        def img_fn():
            # a wave's refill window completes >= 1 sample/pixel per
            # iteration; chunk waves (independent seeds) so the unrolled
            # TPU bounce loop stays bounded regardless of spp
            drain = cfg.max_depth + 1
            film, done_spp, wave = None, 0, 0
            while done_spp < spp:
                todo = min(spp - done_spp, 16)
                f = render_regen(scene, camera, st.xres, st.yres,
                                 todo + drain, cfg,
                                 seed=jnp.int32(args.seed + 7919 * wave),
                                 spp_total=spp)
                film = f if film is None else jax.tree.map(
                    jnp.add, film, f)
                done_spp += todo
                wave += 1
            return finalize(film)
    elif args.devices > 1:
        if args.progress:
            print("warning: --progress is not supported with --devices > 1; "
                  "rendering sharded without progress", file=sys.stderr)
        from fountain_tpu.parallel.shard import render_sharded
        img_fn = lambda: render_sharded(
            scene, camera, st.xres, st.yres, spp, cfg, n_devices=args.devices,
            ftype=ftype, fradius=st.filter_radius, seed=jnp.int32(args.seed))
    elif args.progress:
        from fountain_tpu.integrator.render import render_samples
        from fountain_tpu.scene.film import finalize, make_film

        def img_fn():
            film = make_film(st.xres, st.yres)
            chunk = max(1, spp // 16)
            t1 = None  # rate timer starts AFTER the first chunk: the
            s_rate = 0  # first call pays the jit compile (ADVICE r4)
            for s0 in range(0, spp, chunk):
                s1 = min(s0 + chunk, spp)
                film = render_samples(scene, camera, st.xres, st.yres,
                                      s0, s1, spp, film, cfg, ftype,
                                      st.filter_radius,
                                      seed=jnp.int32(args.seed))
                jax.block_until_ready(film.r_sum)
                if t1 is None:
                    t1, s_rate = time.time(), s1
                    rate = ""
                else:
                    done = (s1 - s_rate) * st.xres * st.yres
                    rate = f"{done / (time.time() - t1):.3g} paths/s   "
                print(f"\r  {s1}/{spp} spp  {rate}",
                      end="", file=sys.stderr, flush=True)
            print(file=sys.stderr)
            return finalize(film)
    else:
        from fountain_tpu.integrator.render import render
        img_fn = lambda: render(scene, camera, st.xres, st.yres, spp, cfg,
                                ftype=ftype, fradius=st.filter_radius,
                                seed=jnp.int32(args.seed))

    t0 = time.time()
    if args.profile:
        jax.block_until_ready(img_fn())  # compile outside the trace
        t0 = time.time()
        with jax.profiler.trace(args.profile):
            img = np.asarray(jax.block_until_ready(img_fn()))
        print(f"profile trace written to {args.profile} "
              "(inspect with tools/profile_trace2.py <dir>)",
              file=sys.stderr)
    else:
        img = np.asarray(jax.block_until_ready(img_fn()))
    dt = time.time() - t0
    n_paths = st.xres * st.yres * spp
    print(f"Completed rendering in {dt:.2f} s "
          f"({n_paths / dt:.3g} paths/s incl. compile)", file=sys.stderr)

    out = args.output or st.output
    save_image(out, img)
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
