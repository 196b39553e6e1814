#!/usr/bin/env python
"""Headline benchmark: fwd+bwd rays/s on the rounded_cube scene.

Renders data/rounded_cube.ply (4332 tris, LBVH) under an IMAGE-mapped
environment light (sky.exr, importance-sampled through the per-light
texel alias table) with a matte material — BASELINE.json config 3 as
specified — and measures the steady-state throughput of the
*differentiable* render step (value_and_grad of the image loss w.r.t.
the texture/albedo parameter table). Ray counting is exact: one
closest-hit ray per active lane per bounce plus shadow + MIS rays on NEE
bounces (trace_paths count_rays). ``--uniform`` reverts to the round-4
uniform-light variant for A/B comparison.

Prints ONE json line:
  {"metric": "rays_per_s_fwd_bwd", "value": N, "unit": "rays/s",
   "vs_baseline": N}

vs_baseline is against CPU_BASELINE_RAYS_PER_S: the same workload measured
on this machine's CPU backend (all host cores via XLA) — the stand-in for
fountain-CPU, which cannot be built here (no Rust toolchain; see
BASELINE.md). The XLA-CPU backend measurement (`python bench.py --cpu`) is recorded
in BASELINE.md for orientation only.
"""
import argparse
import json
import sys
import time

# fountain-CPU cannot be built here (no Rust toolchain): this is a good-faith
# literature estimate for a rayon-parallel PBRT-style CPU tracer on this class
# of host (see BASELINE.md "Measured baselines"). The >=10x north-star target
# therefore means >= 3e7 rays/s/chip fwd+bwd.
CPU_BASELINE_RAYS_PER_S = 3.0e6

RES = 512
SPP_PER_STEP = 1
MAX_DEPTH = 5
N_TIMED = 16
# path-regeneration wave length: refill window of REGEN_ITERS-(depth+1)
# iterations + drain. Larger = higher occupancy amortization, more HBM
# for remat residuals and longer compiles.
REGEN_ITERS = 24
# CPU baseline measurement uses a smaller frame (rays/s is resolution-
# independent once the wave saturates the vector units)
CPU_RES = 256
CPU_N_TIMED = 2


def build_scene(res, env_image: bool = True):
    """BASELINE.json config 3 AS SPECIFIED (round-5 task 1): rounded_cube
    under an IMAGE-mapped environment light (importance-sampled via the
    per-light texel alias table). ``env_image=False`` falls back to the
    round-4 uniform light for A/B profiling."""
    from fountain_tpu.core import transform as tf
    from fountain_tpu.geometry.bvh import attach_bvh
    from fountain_tpu.io.exr import read_exr
    from fountain_tpu.io.ply import load_ply
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.scene.camera import make_perspective_camera

    mesh = load_ply("data/rounded_cube.ply")
    b = SceneBuilder()
    env_tex = None
    if env_image:
        sky = b.add_image(read_exr("data/sky.exr"))
        env_tex = b.add_image_texture(sky)
    mat = b.add_matte(kd=[0.6, 0.5, 0.4])
    b.add_triangle_mesh(mesh.positions, mesh.indices, normals=mesh.normals,
                        mat_id=mat)
    if env_tex is not None:
        b.add_infinite_light([1.0, 1.0, 1.0], env_tex=env_tex)
    else:
        b.add_infinite_light([1.0, 1.0, 1.0])
    scene = attach_bvh(b.build())
    cam = make_perspective_camera(
        tf.look_at([25.0, -30.0, 18.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (res, res), fov_deg=45.0)
    return scene, cam


def kernel_gate(scene):
    """On-TPU kernel correctness gate (round-4 task 9): the Pallas sweep
    must agree with the XLA tensor path on a camera-ray batch, and the
    100k-interior-ray watertight check must show zero leaks. Raises on
    failure so the driver's bench run fails loudly after any kernel
    regression."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from fountain_tpu.core.vecmath import V3
    from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
    from fountain_tpu.geometry.tensor_tri import mt_intersect

    if jax.devices()[0].platform != "tpu" or scene.tri_qfeat is None:
        return "skipped (no tpu)"
    n = 4096
    rng = np.random.default_rng(7)
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(*[jnp.asarray(o[:, k]) for k in range(3)])
    dv = V3(*[jnp.asarray(d[:, k]) for k in range(3)])
    cap = jnp.full((n,), jnp.inf, jnp.float32)
    t0, i0, ok0 = map(np.asarray,
                      mt_intersect(scene.tri_features, jnp.asarray(o),
                                   jnp.asarray(d), cap))
    t1, i1, ok1 = map(np.asarray,
                      mt_intersect_pallas(scene.tri_qfeat, ov, dv, cap))
    if (ok0 != ok1).any():
        raise AssertionError(
            f"kernel gate: {int((ok0 != ok1).sum())} hit/miss mismatches "
            "between pallas and tensor paths")
    m = ok0
    rel = np.abs(t0[m] - t1[m]) / np.maximum(t0[m], 1e-9)
    if m.any() and rel.max() > 5e-5:
        raise AssertionError(f"kernel gate: t rel err {rel.max():.2e}")
    # interior watertight: every ray from inside the closed mesh must hit
    nw = 100_000
    dirs = rng.normal(size=(nw, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ow = V3(jnp.zeros(nw), jnp.zeros(nw), jnp.zeros(nw))
    dw = V3(*[jnp.asarray(dirs[:, k]) for k in range(3)])
    _, _, okw = mt_intersect_pallas(scene.tri_qfeat, ow, dw,
                                    jnp.full((nw,), jnp.inf, jnp.float32))
    leaks = int(nw - np.asarray(okw).sum())
    if leaks:
        raise AssertionError(f"kernel gate: {leaks} leaked rays / {nw}")
    return "ok"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="measure on the CPU backend (baseline proxy)")
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--no-gate", action="store_true",
                    help="skip the on-TPU kernel correctness gate")
    ap.add_argument("--uniform", action="store_true",
                    help="uniform env light instead of the image env map "
                         "(the round-4 configuration, for A/B)")
    ap.add_argument("--no-regen", action="store_true",
                    help="plain fixed-wave tracing (round-4 configuration) "
                         "instead of path regeneration")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    res = args.res or (CPU_RES if args.cpu else RES)
    n_timed = args.steps or (CPU_N_TIMED if args.cpu else N_TIMED)

    import jax
    try:  # persistent compile cache: axon remote compiles are minutes-slow
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fountain_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from fountain_tpu.integrator.path import PathConfig, trace_paths
    from fountain_tpu.integrator.render import render_wave
    from fountain_tpu.scene.camera import generate_rays
    from fountain_tpu.core import rng
    from fountain_tpu.integrator.path import DIM_CAMERA

    scene, cam = build_scene(res, env_image=not args.uniform)
    cfg = PathConfig(max_depth=MAX_DEPTH, rr_threshold=1.0, nee=True)
    n = res * res

    regen = not args.no_regen

    def make_ray_fn(seed):
        def ray_fn(lane_ids, sample_ids):
            px = (lane_ids % res).astype(jnp.float32)
            py = (lane_ids // res).astype(jnp.float32)
            u = rng.uniform4(lane_ids, sample_ids, DIM_CAMERA, seed)
            rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
            return rays.o, rays.d, jnp.zeros_like(px)
        return ray_fn

    def wave_radiance(scene, seed, count_rays):
        lane = jnp.arange(n, dtype=jnp.int32)
        sample = jnp.zeros((n,), jnp.int32)
        ray_fn = make_ray_fn(seed)
        o, d, _ = ray_fn(lane, sample)
        if regen:
            # path-regeneration wave (trace_paths regen_fn): dead lanes
            # start the next sample of their pixel instead of idling
            return trace_paths(scene, o, d, lane, sample, cfg, seed=seed,
                               count_rays=count_rays, regen_fn=ray_fn,
                               n_iters=REGEN_ITERS)
        return trace_paths(scene, o, d, lane, sample, cfg,
                           seed=seed, count_rays=count_rays)

    # exact ray count for one wave (forward accounting)
    @jax.jit
    def count_fn(scene, seed):
        out = wave_radiance(scene, seed, True)
        return out[-1] if regen else out[1]

    # the timed differentiable step: fwd + bwd w.r.t. texture params.
    # The scene is CLOSED OVER (not a jit argument): scene tables are
    # step-invariant, and passing them as runtime parameters was measured
    # 5x slower on v5e (argument tables lose the constant memory-space
    # placement the gather fusions rely on).
    @jax.jit
    def step(tex_value, seed):
        def loss_fn(tv):
            s = scene._replace(textures=scene.textures._replace(value=tv))
            if regen:
                out = wave_radiance(s, seed, False)
                total = jnp.sum(out.accum.sum())
                n_done = jnp.maximum(out.n_done.sum(), 1)
                return total / (3.0 * n_done.astype(jnp.float32))
            radiance = wave_radiance(s, seed, False)
            return jnp.mean(radiance.sum()) / 3.0
        return jax.value_and_grad(loss_fn)(tex_value)

    rays_per_wave = int(count_fn(scene, jnp.int32(0)))

    tv = scene.textures.value
    # warmup / compile
    loss, grad = step(tv, jnp.int32(0))
    jax.block_until_ready((loss, grad))

    t0 = time.time()
    for i in range(n_timed):
        loss, grad = step(tv, jnp.int32(i + 1))
    jax.block_until_ready((loss, grad))
    dt = time.time() - t0

    gate = "skipped"
    if not args.no_gate and not args.cpu:
        gate = kernel_gate(scene)  # raises (bench fails loudly) on regress

    rays_per_s = n_timed * rays_per_wave / dt
    occupancy = rays_per_wave / (n * (REGEN_ITERS if regen
                                      else MAX_DEPTH + 1))
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / CPU_BASELINE_RAYS_PER_S, 3),
    }))
    print(f"# device={jax.devices()[0].platform} res={res} depth={MAX_DEPTH} "
          f"rays/wave={rays_per_wave} steps={n_timed} dt={dt:.3f}s "
          f"loss={float(loss):.5f} lane_occupancy={occupancy:.3f} "
          f"kernel_gate={gate}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
