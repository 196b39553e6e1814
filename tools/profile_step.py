#!/usr/bin/env python
"""Per-component timing breakdown of the bench step (VERDICT r1 item 1).

Times, on the real device, each suspect from the round-1 review:
  - one Pallas intersect sweep (sorted vs unsorted)
  - one argsort of the wavefront keys
  - forward-only trace_paths
  - fwd+bwd step (the bench workload)
so the 5.5 s/step can be attributed before optimizing.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

RES = 512
DEPTH = 5
REPS = 8


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from bench import build_scene
    from fountain_tpu.core import rng
    from fountain_tpu.integrator.path import DIM_CAMERA, PathConfig, trace_paths
    from fountain_tpu.scene.camera import generate_rays

    scene, cam = build_scene(RES)
    n = RES * RES
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % RES).astype(jnp.float32)
    py = (lane // RES).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, 0)
    p_film = jnp.stack([px + u[0], py + u[1]], axis=-1)
    p_lens = jnp.stack([u[2], u[3]], axis=-1)
    rays = generate_rays(cam, p_film, p_lens)
    o, d = rays.o, rays.d
    t_max = jnp.full((n,), jnp.inf)

    from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas, sort_keys

    qd = scene.tri_qfeat

    f_sorted = jax.jit(lambda o, d, t: mt_intersect_pallas(qd, o, d, t,
                                                           sort=True))
    f_unsorted = jax.jit(lambda o, d, t: mt_intersect_pallas(qd, o, d, t,
                                                             sort=False))
    f_sortonly = jax.jit(lambda o, d: jnp.argsort(sort_keys(o, d)))

    print(f"# n_rays={n} faces={scene.triangles.count} "
          f"device={jax.devices()[0]}")
    print(f"sweep_sorted      {timeit(f_sorted, o, d, t_max)*1e3:9.2f} ms")
    print(f"sweep_unsorted    {timeit(f_unsorted, o, d, t_max)*1e3:9.2f} ms")
    print(f"argsort_only      {timeit(f_sortonly, o, d)*1e3:9.2f} ms")

    # incoherent rays (shuffled) to mimic bounce rays
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    o2, d2 = o[perm], d[perm]
    print(f"sweep_sorted_inc  {timeit(f_sorted, o2, d2, t_max)*1e3:9.2f} ms")
    print(f"sweep_unsort_inc  {timeit(f_unsorted, o2, d2, t_max)*1e3:9.2f} ms")

    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)
    sample = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def fwd(tv, seed):
        s = scene._replace(textures=scene.textures._replace(value=tv))
        return jnp.mean(trace_paths(s, o, d, lane, sample, cfg, seed=seed))

    @jax.jit
    def fwdbwd(tv, seed):
        return jax.value_and_grad(
            lambda tv: fwd.__wrapped__(tv, seed))(tv)

    tv = scene.textures.value
    t_f = timeit(fwd, tv, jnp.int32(1), reps=4)
    print(f"trace_fwd         {t_f*1e3:9.2f} ms")
    t_fb = timeit(fwdbwd, tv, jnp.int32(1), reps=4)
    print(f"trace_fwd_bwd     {t_fb*1e3:9.2f} ms")
    print(f"# bwd/fwd ratio = {t_fb/t_f:.2f}")


if __name__ == "__main__":
    main()
