#!/usr/bin/env python
"""Compare the TPU Pallas intersect path against the CPU tensor-path oracle
on the bench scene (one forward wave + raw intersect results)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(platform, res=128):
    import jax
    import jax.numpy as jnp
    from bench import build_scene
    from fountain_tpu.core import rng
    from fountain_tpu.integrator.path import DIM_CAMERA, PathConfig, trace_paths
    from fountain_tpu.scene.camera import generate_rays

    scene, cam = build_scene(res)
    cfg = PathConfig(max_depth=5, rr_threshold=1.0, nee=True)
    n = res * res
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, 0)
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    sample = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def fwd(scene):
        return trace_paths(scene, rays.o, rays.d, lane, sample, cfg,
                           seed=0, count_rays=True)

    rad_v3, n_rays = jax.block_until_ready(fwd(scene))
    rad = rad_v3.stack()

    # raw first-bounce intersect comparison
    from fountain_tpu.geometry.intersect import scene_intersect
    @jax.jit
    def isect(scene):
        h = scene_intersect(scene, rays.o, rays.d, jnp.full((n,), jnp.inf))
        return h.t, h.prim_id, h.valid
    t, idx, ok = jax.block_until_ready(isect(scene))
    return (np.asarray(rad), int(n_rays), np.asarray(t), np.asarray(idx),
            np.asarray(ok))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if which == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    rad, n_rays, t, idx, ok = run(which)
    np.savez(f"/tmp/cmp_{which}.npz", rad=rad, n_rays=n_rays, t=t, idx=idx,
             ok=ok)
    print(f"{which}: n_rays={n_rays} rad_mean={rad.mean():.5f} "
          f"hits={ok.sum()}/{len(ok)}")
    if which == "tpu" and os.path.exists("/tmp/cmp_cpu.npz"):
        c = np.load("/tmp/cmp_cpu.npz")
        both = ok & c["ok"]
        print(f"valid agree: {(ok == c['ok']).mean():.6f}  "
              f"idx agree (both-hit): {(idx[both] == c['idx'][both]).mean():.6f}")
        terr = np.abs(t[both] - c["t"][both]) / np.maximum(np.abs(c["t"][both]), 1e-9)
        print(f"t relerr max {terr.max():.2e}  "
              f"rad maxabs diff {np.abs(rad - c['rad']).max():.4f}  "
              f"rad mean diff {(rad.mean() - c['rad'].mean()):+.5f}")
        extra = ok & ~c["ok"]
        missing = ~ok & c["ok"]
        print(f"phantom hits: {extra.sum()}  missing hits: {missing.sum()}")


if __name__ == "__main__":
    main()
