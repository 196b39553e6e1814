"""Render driver: camera → wavefront trace → film, batched over samples.

TPU-native analog of the reference SamplerIntegrator driver
(src/integrator/mod.rs:193-281): instead of rayon tiles, a full-image lane
wave is traced per sample index inside a ``lax.fori_loop``; the film is the
loop carry (pure accumulation — the reference's mutex merge film.rs:121-132
is a shifted dense add here). Determinism: every random number depends only
on (pixel lane, sample index), so the image is independent of batching and
of the number of chips.

Layout: everything flows in component-SoA V3 (flat [N] per component — see
core.vecmath.V3) and the film is channel-planar; no [N, 3] arrays ever
materialize in HBM.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from fountain_tpu.core import rng
from fountain_tpu.core.vecmath import Float, length
from fountain_tpu.integrator.path import DIM_CAMERA, PathConfig, trace_paths
from fountain_tpu.scene.camera import PerspectiveCamera, generate_rays
from fountain_tpu.scene.film import (FILTER_BOX, Film, add_samples_aligned,
                                     finalize, make_film)
from fountain_tpu.scene.types import Scene


def render_wave(scene: Scene, camera: PerspectiveCamera, xres: int,
                yres: int, sample_idx, cfg: PathConfig, seed=0,
                lane_offset: int = 0, n_lanes: Optional[int] = None,
                detach_sampling: bool = True, diff_scale: float = 1.0):
    """Trace one sample-per-pixel wave; returns (frac_x, frac_y, L) with
    frac_x/frac_y the in-pixel jitter [N] in [0,1)^2 and L a V3 of [N].

    Lanes cover pixels [lane_offset, lane_offset + n_lanes) in row-major
    order — the slicing hook used by the multi-chip sharding layer.
    ``seed`` may be a traced scalar (does not trigger recompilation).
    ``diff_scale`` scales the texture-filter ray-cone spread (the
    reference's scale_differentials 1/sqrt(spp), geometry/mod.rs:125-132).
    """
    total = xres * yres
    n_lanes = total if n_lanes is None else n_lanes
    lane = lane_offset + jnp.arange(n_lanes, dtype=jnp.int32)
    px = (lane % xres).astype(Float)
    py = (lane // xres).astype(Float)

    u = rng.uniform4(lane, sample_idx, DIM_CAMERA, seed)
    rays = generate_rays(camera, px + u[0], py + u[1], u[2], u[3])

    # per-lane cone spread from the camera differentials
    sx = length(rays.rx_d - rays.d)
    sy = length(rays.ry_d - rays.d)
    spread = jnp.maximum(sx, sy) * diff_scale

    sample = jnp.full((n_lanes,), sample_idx, jnp.int32) \
        if jnp.ndim(sample_idx) == 0 else sample_idx
    radiance = trace_paths(scene, rays.o, rays.d, lane, sample, cfg,
                           seed=seed, detach_sampling=detach_sampling,
                           cone_spread=spread)
    return u[0], u[1], radiance


@partial(jax.jit, static_argnames=("xres", "yres", "s_begin", "s_end",
                                   "spp_total", "cfg", "ftype", "fradius",
                                   "detach_sampling"))
def render_samples(scene: Scene, camera: PerspectiveCamera, xres: int,
                   yres: int, s_begin: int, s_end: int, spp_total: int,
                   film: Film, cfg: PathConfig = PathConfig(),
                   ftype: int = FILTER_BOX, fradius: float = 0.5,
                   seed=0, detach_sampling: bool = True) -> Film:
    """Accumulate samples [s_begin, s_end) into `film` and return it.

    The checkpoint/resume primitive (reference sampler/mod.rs:53 reserved
    `set_sample_number`, never implemented): every random number is a
    counter hash of (lane, sample index), so rendering [0,4) + [4,8) in two
    calls is bitwise identical to [0,8) in one — the film plus the next
    sample index IS the complete resumable state (io.checkpoint).
    `spp_total` only scales the texture-filter differentials and must be
    held fixed across a resumed run.
    """
    def body(s, film: Film) -> Film:
        fx, fy, radiance = render_wave(
            scene, camera, xres, yres, s, cfg, seed=seed,
            detach_sampling=detach_sampling,
            diff_scale=1.0 / max(spp_total, 1) ** 0.5)
        # full-frame lane-aligned layout -> scatter-free shifted-add splat
        return add_samples_aligned(film, fx, fy, radiance, ftype=ftype,
                                   radius=fradius)

    return jax.lax.fori_loop(s_begin, s_end, body, film)


@partial(jax.jit, static_argnames=("xres", "yres", "n_iters", "cfg",
                                   "spp_total", "detach_sampling"))
def render_regen(scene: Scene, camera: PerspectiveCamera, xres: int,
                 yres: int, n_iters: int, cfg: PathConfig = PathConfig(),
                 seed=0, sample0=0, spp_total: int = 16,
                 detach_sampling: bool = True) -> Film:
    """Render one path-REGENERATION wave into a film (box filter).

    The occupancy-optimal production driver (see trace_paths ``regen_fn``):
    each lane owns one pixel; a lane whose path terminates immediately
    starts that pixel's next sample, so every per-bounce kernel runs on a
    ~full wave instead of the ~25% that survive in a fixed wave. One wave
    of ``n_iters`` iterations completes roughly
    ``n_iters - (max_depth+1)`` samples per pixel (more when paths
    terminate early); per-pixel sample counts vary, so the film's
    weight_sum carries the true per-pixel count — sum/weight is the
    standard progressive estimator. Accumulation restarts sample counters
    at ``sample0`` (pass the previous wave's max sample index to resume;
    bitwise-deterministic like render_samples). Box filter only: each
    completed sample splats 1.0 into its own pixel (radius-0.5 box), so
    no per-sample jitter bookkeeping is needed across refills.
    """
    total = xres * yres
    lane = jnp.arange(total, dtype=jnp.int32)

    def ray_fn(lane_ids, sample_ids):
        px = (lane_ids % xres).astype(Float)
        py = (lane_ids // xres).astype(Float)
        u = rng.uniform4(lane_ids, sample_ids, DIM_CAMERA, seed)
        rays = generate_rays(camera, px + u[0], py + u[1], u[2], u[3])
        sx = length(rays.rx_d - rays.d)
        sy = length(rays.ry_d - rays.d)
        spread = jnp.maximum(sx, sy) / max(spp_total, 1) ** 0.5
        return rays.o, rays.d, spread

    sample = jnp.full((total,), sample0, jnp.int32)
    o, d, _ = ray_fn(lane, sample)
    out = trace_paths(scene, o, d, lane, sample, cfg, seed=seed,
                      detach_sampling=detach_sampling, regen_fn=ray_fn,
                      n_iters=n_iters)
    w = out.n_done.astype(Float).reshape(yres, xres)
    return Film(r_sum=out.accum.x.reshape(yres, xres),
                g_sum=out.accum.y.reshape(yres, xres),
                b_sum=out.accum.z.reshape(yres, xres),
                weight_sum=w)


@partial(jax.jit, static_argnames=("xres", "yres", "spp", "cfg", "ftype",
                                   "fradius", "detach_sampling"))
def render(scene: Scene, camera: PerspectiveCamera, xres: int, yres: int,
           spp: int, cfg: PathConfig = PathConfig(),
           ftype: int = FILTER_BOX, fradius: float = 0.5,
           seed=0, detach_sampling: bool = True) -> jnp.ndarray:
    """Render a full image [yres, xres, 3] with `spp` samples per pixel.

    ``detach_sampling=False`` switches the whole estimator to ATTACHED
    sampling: sampled directions keep their reparameterization chain
    (u → wh(α) → wi), so jax.grad matches finite differences of the same
    fixed-random-stream estimator even for sampled-lobe shape parameters
    (roughness). Default True = the detached estimator (lower variance,
    safe for discrete-choice params)."""
    film = render_samples(scene, camera, xres, yres, 0, spp, spp,
                          make_film(xres, yres), cfg, ftype, fradius, seed,
                          detach_sampling=detach_sampling)
    return finalize(film)
