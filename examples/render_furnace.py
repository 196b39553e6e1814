"""End-to-end TPU drive: render the furnace scene, check the analytic value,
and report rays/s (reference scene: testscenes/furnace_empty.pbrt; analytic
solution 1/(1-rho) = 2.0, reference tests/furnace.rs:15-21).

Usage: python examples/render_furnace.py [--res 256] [--spp 64] [--cpu]
"""
import argparse
import os
import sys
import time

import numpy as np

# self-locate the repo root; PYTHONPATH=. breaks the remote-TPU plugin
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from fountain_tpu.core import transform as tf
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.integrator.render import render
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.scene.camera import make_perspective_camera

    print(f"devices: {jax.devices()}")

    b = SceneBuilder()
    mat = b.add_matte(kd=[0.5] * 3)
    sph = b.add_sphere(radius=100.0, mat_id=mat, reverse_orientation=True)
    b.add_area_light_sphere(sph, [1.0] * 3)
    scene = b.build()

    cam = make_perspective_camera(
        tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (args.res, args.res), fov_deg=60.0)

    cfg = PathConfig(max_depth=args.depth, rr_threshold=1.0, nee=True)
    t0 = time.time()
    img = jax.block_until_ready(
        render(scene, cam, args.res, args.res, args.spp, cfg))
    t_compile = time.time() - t0
    t0 = time.time()
    img = jax.block_until_ready(
        render(scene, cam, args.res, args.res, args.spp, cfg))
    t_run = time.time() - t0

    img = np.asarray(img)
    n_pixels = args.res * args.res
    # camera rays + NEE shadow & MIS rays per bounce; report camera-path rays
    paths = n_pixels * args.spp
    print(f"compile: {t_compile:.1f}s  render: {t_run:.3f}s  "
          f"paths/s: {paths / t_run:.3g}")
    print(f"image mean: {img.mean():.4f}  std: {img.std():.4f}  "
          f"min: {img.min():.4f}  max: {img.max():.4f}  (expect ~2.0)")
    ok = np.isfinite(img).all() and abs(img.mean() - 2.0) < 0.01 \
        and img.std() < 0.2
    print("FURNACE OK" if ok else "FURNACE MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
