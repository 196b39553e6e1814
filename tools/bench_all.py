#!/usr/bin/env python
"""Benchmark every BASELINE.json config and print a markdown table.

Configs (BASELINE.json "configs"):
  1. furnace_empty.pbrt — sphere + emitting enclosure, analytic furnace
  2. diffuse box + mesh area light (NEE + BSDF MIS)
  3. rounded_cube.ply under an IMAGE env light (LBVH over tris)
  4. GGX metal + conductor Fresnel, textured roughness, mipmapped
  5. testscenes/logo_cube.pbrt flagship (DoF + PLY + metal + env map)

Measures forward rays/s for all, plus fwd+bwd rays/s for configs 3 and 5
(5 differentiates albedo/roughness texture table AND env-map texels).
Writes tools/bench_all_out.json; paste the table into BASELINE.md.
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

RES = 512
DEPTH = 5
REPS = 8


def _wave(scene, cam, res, cfg, seed, count):
    from fountain_tpu.core import rng
    from fountain_tpu.integrator.path import DIM_CAMERA, trace_paths
    from fountain_tpu.scene.camera import generate_rays
    n = res * res
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = rng.uniform4(lane, 0, DIM_CAMERA, seed)
    rays = generate_rays(cam, px + u[0], py + u[1], u[2], u[3])
    return trace_paths(scene, rays.o, rays.d, lane,
                       jnp.zeros((n,), jnp.int32), cfg, seed=seed,
                       count_rays=count)


def measure(name, scene, cam, cfg, res=RES, bwd_params=None):
    """bwd_params: None -> forward only; else a fn(scene, leaves) that
    reconstitutes the scene from differentiable leaves + the leaf tuple."""
    @jax.jit
    def count_fn(seed):
        _, n_rays = _wave(scene, cam, res, cfg, seed, True)
        return n_rays

    rays_per_wave = int(count_fn(jnp.int32(0)))

    @jax.jit
    def fwd(seed):
        r = _wave(scene, cam, res, cfg, seed, False)
        return (r.x + r.y + r.z).sum()

    out = fwd(jnp.int32(0))
    jax.device_get(out)
    t0 = time.time()
    for i in range(REPS):
        out = fwd(jnp.int32(i + 1))
        jax.device_get(out)
    dt_f = (time.time() - t0) / REPS
    row = {"config": name, "res": res, "rays_per_wave": rays_per_wave,
           "fwd_ms": round(dt_f * 1e3, 1),
           "fwd_rays_per_s": round(rays_per_wave / dt_f, 0)}

    if bwd_params is not None:
        rebuild, leaves = bwd_params

        @jax.jit
        def step(leaves, seed):
            def loss_fn(leaves):
                s = rebuild(scene, leaves)
                r = _wave(s, cam, res, cfg, seed, False)
                return (r.x + r.y + r.z).sum() / 3.0
            return jax.value_and_grad(loss_fn)(leaves)

        out = step(leaves, jnp.int32(0))
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.time()
        for i in range(REPS):
            out = step(leaves, jnp.int32(i + 1))
            jax.device_get(jax.tree.leaves(out)[0])
        dt_b = (time.time() - t0) / REPS
        gflat = jax.tree.leaves(out[1])
        gfin = all(bool(jnp.all(jnp.isfinite(g))) for g in gflat)
        row.update({"fwdbwd_ms": round(dt_b * 1e3, 1),
                    "fwdbwd_rays_per_s": round(rays_per_wave / dt_b, 0),
                    "grad_finite": gfin})
    print(json.dumps(row), flush=True)
    return row


def config1():
    from fountain_tpu.io.pbrt import load_pbrt
    from fountain_tpu.integrator.path import PathConfig
    scene, cam_native, st = load_pbrt("testscenes/furnace_empty.pbrt")
    # re-make the camera at bench resolution
    from fountain_tpu.scene.camera import make_perspective_camera
    cam = cam_native._replace()
    cam = _recam(scene, "furnace")
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)
    return "furnace_empty", scene, cam, cfg, None


def _recam(scene, kind):
    from fountain_tpu.core import transform as tf
    from fountain_tpu.scene.camera import make_perspective_camera
    if kind == "furnace":
        return make_perspective_camera(
            tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
            (RES, RES), fov_deg=60.0)
    raise ValueError(kind)


def config2():
    """Diffuse box (5 quads) + mesh area light at the ceiling: NEE+MIS."""
    from fountain_tpu.geometry.bvh import attach_bvh
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.core import transform as tf
    from fountain_tpu.scene.camera import make_perspective_camera

    def quad(b, p0, p1, p2, p3, mat):
        p = np.asarray([p0, p1, p2, p3], np.float32)
        f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        return b.add_triangle_mesh(p, f, mat_id=mat)

    b = SceneBuilder()
    white = b.add_matte(kd=[0.73, 0.73, 0.73])
    red = b.add_matte(kd=[0.65, 0.05, 0.05])
    green = b.add_matte(kd=[0.12, 0.45, 0.15])
    s = 278.0
    quad(b, [0, 0, 0], [s*2, 0, 0], [s*2, s*2, 0], [0, s*2, 0], white)  # floor
    quad(b, [0, 0, s*2], [0, s*2, s*2], [s*2, s*2, s*2], [s*2, 0, s*2], white)
    quad(b, [0, s*2, 0], [s*2, s*2, 0], [s*2, s*2, s*2], [0, s*2, s*2], white)
    quad(b, [0, 0, 0], [0, s*2, 0], [0, s*2, s*2], [0, 0, s*2], red)
    quad(b, [s*2, 0, 0], [s*2, 0, s*2], [s*2, s*2, s*2], [s*2, s*2, 0], green)
    lm = quad(b, [s-65, s-52, s*2-1], [s+65, s-52, s*2-1],
              [s+65, s+52, s*2-1], [s-65, s+52, s*2-1], white)
    b.add_area_light_mesh(lm, [15.0, 15.0, 15.0])
    scene = attach_bvh(b.build())
    cam = make_perspective_camera(
        tf.look_at([s, -800.0, s], [s, 0.0, s], [0.0, 0.0, 1.0]),
        (RES, RES), fov_deg=40.0)
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)
    return "mis_box", scene, cam, cfg, None


def config3():
    """rounded_cube.ply under an image env light + texture grad."""
    from fountain_tpu.geometry.bvh import attach_bvh
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.io.exr import read_exr
    from fountain_tpu.io.ply import load_ply
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.core import transform as tf
    from fountain_tpu.scene.camera import make_perspective_camera

    mesh = load_ply("data/rounded_cube.ply")
    b = SceneBuilder()
    sky = b.add_image(read_exr("data/sky.exr"))
    sky_tex = b.add_image_texture(sky)
    mat = b.add_matte(kd=[0.6, 0.5, 0.4])
    b.add_triangle_mesh(mesh.positions, mesh.indices, normals=mesh.normals,
                        mat_id=mat)
    b.add_infinite_light([1.0, 1.0, 1.0], env_tex=sky_tex)
    scene = attach_bvh(b.build())
    cam = make_perspective_camera(
        tf.look_at([25.0, -30.0, 18.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (RES, RES), fov_deg=45.0)
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)

    def rebuild(s, leaves):
        return s._replace(textures=s.textures._replace(value=leaves))
    return "rounded_cube_env", scene, cam, cfg, (rebuild,
                                                 scene.textures.value)


def config4():
    """GGX metal sphere with textured (image) roughness under env light."""
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.io.image import load_image
    from fountain_tpu.scene.build import SceneBuilder
    from fountain_tpu.core import transform as tf
    from fountain_tpu.scene.camera import make_perspective_camera

    b = SceneBuilder()
    logo = b.add_image(load_image("data/logo.png"))
    rough_tex = b.add_image_texture(logo, uscale=2.0)
    mat = b.add_metal(eta3=[0.2004, 0.9228, 1.102],
                      k3=[3.913, 2.448, 2.137], roughness=rough_tex)
    b.add_sphere(radius=6.0, mat_id=mat)
    b.add_infinite_light([1.0, 1.0, 1.0])
    scene = b.build()
    cam = make_perspective_camera(
        tf.look_at([0.0, -20.0, 6.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (RES, RES), fov_deg=45.0)
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)
    return "metal_textured_ggx", scene, cam, cfg, None


def config5():
    """Flagship logo_cube.pbrt: fwd + fwd/bwd differentiating the texture
    table AND env-map atlas texels."""
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.io.pbrt import load_pbrt
    scene, cam, st = load_pbrt("testscenes/logo_cube.pbrt")
    cfg = PathConfig(max_depth=DEPTH, rr_threshold=1.0, nee=True)

    def rebuild(s, leaves):
        tv, texels = leaves
        return s._replace(
            textures=s.textures._replace(value=tv),
            env_images=s.env_images._replace(texels=texels))
    leaves = (scene.textures.value, scene.env_images.texels)
    return "logo_cube_flagship", scene, cam, cfg, (rebuild, leaves)


def main():
    rows = []
    for make in (config1, config2, config3, config4, config5):
        name, scene, cam, cfg, bwd = make()
        try:
            rows.append(measure(name, scene, cam, cfg, bwd_params=bwd))
        except Exception as e:
            print(f"# {name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            rows.append({"config": name, "error": str(e)[:200]})
    with open("tools/bench_all_out.json", "w") as f:
        json.dump({"rows": rows, "res": RES, "depth": DEPTH}, f, indent=1)
    print("# wrote tools/bench_all_out.json", file=sys.stderr)


if __name__ == "__main__":
    main()
