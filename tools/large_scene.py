#!/usr/bin/env python
"""Large-scene proof (round-4 task 6): loop-subdivide rounded_cube to
>= 200k faces, oracle-test the streaming Pallas sweep against a numpy
brute-force closest hit, run the interior watertight gate, and measure
the sweep + full render step rays/s at that size.

Run on the TPU: python tools/large_scene.py
Writes tools/large_scene_out.json.
"""
import json
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N_ORACLE = 512
RES = 512
DEPTH = 5


def build_big_mesh():
    from fountain_tpu.geometry.loop_subdiv import (loop_subdivide,
                                                   weld_vertices)
    from fountain_tpu.io.ply import load_ply
    mesh = load_ply("data/rounded_cube.ply")
    t0 = time.time()
    # the PLY duplicates shared vertices (per-face normals); weld first or
    # Loop boundary rules open cracks along every seam (33% ray leaks)
    wp, wf = weld_vertices(mesh.positions, mesh.indices)
    p, f, n = loop_subdivide(wp, wf, n_levels=3)
    print(f"# subdivided to {len(f)} faces in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    assert len(f) >= 200_000, len(f)
    return p.astype(np.float32), f.astype(np.int32), n.astype(np.float32)


def brute_closest(tv, o, d):
    """Numpy Möller–Trumbore closest hit, chunked over faces."""
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    best_t = np.full(len(o), np.inf, np.float64)
    best_i = np.full(len(o), -1, np.int64)
    CH = 16384
    for s in range(0, len(tv), CH):
        a0 = v0[s:s + CH][None]          # [1, C, 3]
        ae1 = e1[s:s + CH][None]
        ae2 = e2[s:s + CH][None]
        od = d[:, None]                  # [N, 1, 3]
        oo = o[:, None]
        pvec = np.cross(od, ae2)
        det = (pvec * ae1).sum(-1)
        inv = 1.0 / np.where(np.abs(det) < 1e-24, 1.0, det)
        tvec = oo - a0
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, ae1)
        v = (od * qvec).sum(-1) * inv
        t = (ae2 * qvec).sum(-1) * inv
        ok = (np.abs(det) > 1e-24) & (u >= -1e-7) & (v >= -1e-7) \
            & (u + v <= 1 + 1e-7) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        ci = t.argmin(1)
        ct = t[np.arange(len(o)), ci]
        better = ct < best_t
        best_t = np.where(better, ct, best_t)
        best_i = np.where(better, s + ci, best_i)
    return best_t, best_i


def main():
    from fountain_tpu.core.vecmath import V3
    from fountain_tpu.geometry.bvh import attach_bvh
    from fountain_tpu.geometry.pallas_tri import mt_intersect_pallas
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.core import transform as tf
    from fountain_tpu.scene.camera import make_perspective_camera

    p, f, nrm = build_big_mesh()
    b = SceneBuilder()
    mat = b.add_matte(kd=[0.6, 0.5, 0.4])
    b.add_triangle_mesh(p, f, normals=nrm, mat_id=mat)
    b.add_infinite_light([1.0, 1.0, 1.0])
    t0 = time.time()
    scene = attach_bvh(b.build())
    print(f"# LBVH+tables built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    n_faces = int(scene.triangles.count)
    tv = np.asarray(scene.bvh_tri_verts, np.float64)  # leaf order

    out = {"n_faces": n_faces}

    # --- oracle: N_ORACLE random rays from outside, pallas vs numpy
    rng = np.random.default_rng(0)
    o = rng.uniform(-30, 30, (N_ORACLE, 3))
    o = np.where(np.abs(o) < 12, np.sign(o) * 12 + o, o)  # keep outside
    tgt = rng.uniform(-5, 5, (N_ORACLE, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref_t, ref_i = brute_closest(tv, o, d)

    ov = V3(*[jnp.asarray(o[:, k], jnp.float32) for k in range(3)])
    dv = V3(*[jnp.asarray(d[:, k], jnp.float32) for k in range(3)])
    t_cap = jnp.full((N_ORACLE,), jnp.inf, jnp.float32)
    t1, i1, ok1 = jax.block_until_ready(
        mt_intersect_pallas(scene.tri_qfeat, ov, dv, t_cap))
    t1, i1, ok1 = map(np.asarray, (t1, i1, ok1))
    hit_ref = np.isfinite(ref_t)
    agree = (hit_ref == ok1)
    out["oracle_rays"] = N_ORACLE
    out["oracle_hit_mismatches"] = int((~agree).sum())
    m = hit_ref & ok1
    rel = np.abs(t1[m] - ref_t[m]) / np.maximum(ref_t[m], 1e-9)
    out["oracle_t_relerr_max"] = float(rel.max()) if m.any() else 0.0
    print(f"# oracle: {out['oracle_hit_mismatches']} mismatches, "
          f"t relerr max {out['oracle_t_relerr_max']:.2e}",
          file=sys.stderr, flush=True)

    # --- interior watertight gate: 100k rays from inside the closed mesh
    NW = 100_000
    dirs = rng.normal(size=(NW, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ow = V3(jnp.zeros(NW), jnp.zeros(NW), jnp.zeros(NW))
    dw = V3(*[jnp.asarray(dirs[:, k], jnp.float32) for k in range(3)])
    _, _, okw = jax.block_until_ready(mt_intersect_pallas(
        scene.tri_qfeat, ow, dw, jnp.full((NW,), jnp.inf, jnp.float32)))
    leaks = int(NW - np.asarray(okw).sum())
    out["watertight_leaks"] = leaks
    print(f"# watertight: {leaks} leaks / {NW}", file=sys.stderr, flush=True)

    # --- sweep rays/s at 512^2 camera wave
    cam = make_perspective_camera(
        tf.look_at([25.0, -30.0, 18.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (RES, RES), fov_deg=45.0)
    from fountain_tpu.core import rng as frng
    from fountain_tpu.integrator.path import (DIM_CAMERA, PathConfig,
                                              trace_paths)
    from fountain_tpu.scene.camera import generate_rays
    n = RES * RES
    lane = jnp.arange(n, dtype=jnp.int32)
    u = frng.uniform4(lane, 0, DIM_CAMERA, jnp.int32(0))
    rays = generate_rays(cam, (lane % RES) + u[0],
                         (lane // RES) + u[1], u[2], u[3])
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)
    sample = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def count_fn(seed):
        _, nr = trace_paths(scene, rays.o, rays.d, lane, sample, cfg,
                            seed=seed, count_rays=True)
        return nr

    rays_per_wave = int(count_fn(jnp.int32(0)))

    @jax.jit
    def step(tvv, seed):
        def loss_fn(tvv):
            s = scene._replace(textures=scene.textures._replace(value=tvv))
            r = trace_paths(s, rays.o, rays.d, lane, sample, cfg, seed=seed)
            return (r.x + r.y + r.z).sum() / 3.0
        return jax.value_and_grad(loss_fn)(tvv)

    tvv = scene.textures.value
    o2 = step(tvv, jnp.int32(0))
    jax.device_get(jax.tree.leaves(o2)[0])
    t0 = time.time()
    REPS = 4
    for i in range(REPS):
        o2 = step(tvv, jnp.int32(i + 1))
        jax.device_get(jax.tree.leaves(o2)[0])
    dt = (time.time() - t0) / REPS
    out["fwdbwd_ms"] = round(dt * 1e3, 1)
    out["rays_per_wave"] = rays_per_wave
    out["fwdbwd_rays_per_s"] = round(rays_per_wave / dt, 0)
    print(json.dumps(out), flush=True)
    with open("tools/large_scene_out.json", "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
