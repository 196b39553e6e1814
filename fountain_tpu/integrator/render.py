"""Render driver: camera → wavefront trace → film, batched over samples.

TPU-native analog of the reference SamplerIntegrator driver
(src/integrator/mod.rs:193-281): instead of rayon tiles, a full-image lane
wave is traced per sample index inside a ``lax.fori_loop``; the film is the
loop carry (pure accumulation — the reference's mutex merge film.rs:121-132
is a scatter-add here). Determinism: every random number depends only on
(pixel lane, sample index), so the image is independent of batching and of
the number of chips.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fountain_tpu.core import rng
from fountain_tpu.core.vecmath import Float
from fountain_tpu.integrator.path import DIM_CAMERA, PathConfig, trace_paths
from fountain_tpu.scene.camera import PerspectiveCamera, generate_rays
from fountain_tpu.scene.film import (FILTER_BOX, Film, add_samples_aligned,
                                     finalize, make_film)
from fountain_tpu.scene.types import Scene


def render_wave(scene: Scene, camera: PerspectiveCamera, xres: int,
                yres: int, sample_idx, cfg: PathConfig, seed=0,
                lane_offset: int = 0, n_lanes: Optional[int] = None,
                detach_sampling: bool = True, diff_scale: float = 1.0):
    """Trace one sample-per-pixel wave; returns (p_film [N,2], L [N,3]).

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
    p_film = jnp.stack([px + u[0], py + u[1]], axis=-1)
    p_lens = jnp.stack([u[2], u[3]], axis=-1)
    rays = generate_rays(camera, p_film, p_lens)

    # per-lane cone spread from the camera differentials
    sx = jnp.linalg.norm(rays.rx_d - rays.d, axis=-1)
    sy = jnp.linalg.norm(rays.ry_d - rays.d, axis=-1)
    spread = jnp.maximum(sx, sy) * diff_scale

    sample = jnp.full((n_lanes,), sample_idx, jnp.int32) \
        if jnp.ndim(sample_idx) == 0 else sample_idx
    radiance = trace_paths(scene, rays.o, rays.d, lane, sample, cfg,
                           seed=seed, detach_sampling=detach_sampling,
                           cone_spread=spread)
    return p_film, radiance


@partial(jax.jit, static_argnames=("xres", "yres", "spp", "cfg", "ftype",
                                   "fradius"))
def render(scene: Scene, camera: PerspectiveCamera, xres: int, yres: int,
           spp: int, cfg: PathConfig = PathConfig(),
           ftype: int = FILTER_BOX, fradius: float = 0.5,
           seed=0) -> jnp.ndarray:
    """Render a full image [yres, xres, 3] with `spp` samples per pixel."""
    film = make_film(xres, yres)

    lane = jnp.arange(xres * yres, dtype=jnp.int32)
    pxy = jnp.stack([(lane % xres).astype(Float),
                     (lane // xres).astype(Float)], axis=-1)

    def body(s, film: Film) -> Film:
        p_film, radiance = render_wave(scene, camera, xres, yres, s, cfg,
                                       seed=seed,
                                       diff_scale=1.0 / max(spp, 1) ** 0.5)
        # full-frame lane-aligned layout -> scatter-free shifted-add splat
        return add_samples_aligned(film, p_film - pxy, radiance, ftype=ftype,
                                   radius=fradius)

    film = jax.lax.fori_loop(0, spp, body, film)
    return finalize(film)
