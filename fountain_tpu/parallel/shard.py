"""Pixel-sharded rendering over a JAX device mesh.

TPU-native replacement for the reference's rayon tile parallelism
(src/integrator/mod.rs:218-227 `into_par_iter`, film merge under a mutex
film.rs:121-132):

- the pixel-lane axis is sharded over a 1D mesh via ``shard_map`` (the
  "data parallel" axis, SURVEY.md §2 parallelism table),
- scene tables (BVH, textures, lights, params) are replicated in each
  chip's HBM (per the north-star design),
- each shard accumulates its lane window into a flat padded film buffer
  with *scatter-free* shifted dense adds (the same formulation as the
  single-chip ``add_samples_aligned``); buffers are summed with ``psum``
  over ICI — the collective analog of the tile merge,
- the counter-based RNG keys off the *global* lane id, so the image is
  bitwise independent of the device count (the reference gets the same
  property from per-tile seeds, integrator/mod.rs:182-185).

Gradients: because the whole thing is `shard_map`ped pure JAX, wrapping the
sharded render in `jax.grad` gives parameter gradients all-reduced over ICI
automatically (the psum transposes to a broadcast and parameter grads psum
in the backward pass).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fountain_tpu.core.vecmath import Float, where3
from fountain_tpu.integrator.path import PathConfig
from fountain_tpu.integrator.render import render_wave
from fountain_tpu.scene.camera import PerspectiveCamera
from fountain_tpu.scene.film import (FILTER_BOX, Film, _support_taps,
                                     filter_weight, finalize)
from fountain_tpu.scene.types import Scene

try:  # JAX >= 0.8 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm
    shard_map = _sm


_dist_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> int:
    """Multi-host entry point (SURVEY §2 communication-backend row).

    Wires ``jax.distributed.initialize`` (DCN rendezvous; on TPU pods all
    arguments auto-detect from the metadata server) and then runs an
    **init barrier**: a psum of 1 over every device in the global mesh.
    The barrier is the minimum failure-detection story SURVEY §5 asks for —
    a host that failed to come up stalls the collective instead of
    silently rendering a partial film (the reference's lone sync point is
    the film-tile mutex, src/film.rs:121-132; here it is a collective, so
    initialization must prove the full mesh is reachable first).

    Safe to call in single-process runs (skips ``initialize`` when no
    coordinator is configured and only one process exists). Returns the
    process index.
    """
    global _dist_initialized
    import os
    have_coord = (coordinator_address is not None
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("COORDINATOR_ADDRESS"))
    multi = (num_processes or 1) > 1 or have_coord
    if multi and not _dist_initialized:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
        _dist_initialized = True
    barrier_sync()
    return jax.process_index()


def barrier_sync() -> None:
    """Block until every device in the global mesh answers.

    Used as the init barrier and before checkpoint writes so restartable
    sample ranges (io.checkpoint) never mix films from disagreeing hosts.

    Multi-process: a host-local array cannot be auto-sharded onto
    non-addressable devices (ADVICE r4), so the cross-host barrier goes
    through ``multihost_utils.sync_global_devices`` (an all-gather over
    the global device set). Single-process keeps the explicit psum(1)
    proof over the local mesh.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("fountain_tpu_init_barrier")
        return
    mesh = make_render_mesh()
    ones = jnp.ones((mesh.devices.size,), jnp.int32)

    fn = shard_map(lambda x: jax.lax.psum(x, "batch"), mesh=mesh,
                   in_specs=(P("batch"),), out_specs=P(), check_vma=False)
    total = int(fn(ones)[0])
    if total != mesh.devices.size:
        raise RuntimeError(
            f"init barrier failed: {total} != {mesh.devices.size}")


def make_render_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D device mesh over the **global** device list: in a multi-host run
    ``jax.devices()`` already spans every process after
    ``init_distributed``, so the same mesh code serves one chip, one host,
    or a pod slice (collectives ride ICI within a slice, DCN across)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devs), ("batch",))


def _shard_body(scene: Scene, camera: PerspectiveCamera, seed,
                xres: int, yres: int, spp: int, cfg: PathConfig,
                ftype: int, fradius: float, lanes_per: int, n_shards: int):
    """Per-device body: render this shard's pixel window into a flat padded
    film buffer via shifted dense adds, then psum the buffers.

    Layout: flat row-major pixel index; a filter tap at pixel offset
    (ox, oy) from a lane's own pixel shifts the flat index by oy*W + ox, so
    each tap writes one contiguous window [off + shift, off + shift + n) of
    the padded buffer (margin absorbs negative/overflow shifts; x/y edge
    wrap lanes are masked by fw = 0). No scatters anywhere.
    """
    taps = _support_taps(fradius)
    total = xres * yres
    margin = taps * (xres + 1)
    buf_len = n_shards * lanes_per + 2 * margin

    shard = jax.lax.axis_index("batch")
    off = shard * lanes_per
    lane = off + jnp.arange(lanes_per, dtype=jnp.int32)
    px = lane % xres
    py = lane // xres

    zeros = jnp.zeros((buf_len,), Float)
    acc = (zeros, zeros, zeros, zeros)

    def body(s, acc):
        r, g, b, wsum = acc
        fx, fy, radiance = render_wave(
            scene, camera, xres, yres, s, cfg, seed=seed,
            lane_offset=off, n_lanes=lanes_per)
        finite = radiance.isfinite() & (lane < total)
        radiance = where3(finite, radiance, 0.0)
        for oy in range(-taps, taps + 1):
            for ox in range(-taps, taps + 1):
                dx = (ox + 0.5) - fx
                dy = (oy + 0.5) - fy
                fw = filter_weight(ftype, fradius, dx, dy)
                inb = ((px + ox >= 0) & (px + ox < xres)
                       & (py + oy >= 0) & (py + oy < yres) & finite)
                fw = jnp.where(inb, fw, 0.0)
                start = (margin + off + oy * xres + ox,)

                def upd(plane, contrib):
                    win = jax.lax.dynamic_slice(plane, start, (lanes_per,))
                    return jax.lax.dynamic_update_slice(
                        plane, win + contrib, start)
                r = upd(r, fw * radiance.x)
                g = upd(g, fw * radiance.y)
                b = upd(b, fw * radiance.z)
                wsum = upd(wsum, fw)
        return r, g, b, wsum

    acc = jax.lax.fori_loop(0, spp, body, acc)
    acc = jax.tree.map(lambda x: jax.lax.psum(x, "batch"), acc)
    r, g, b, wsum = (x[margin:margin + total].reshape(yres, xres)
                     for x in acc)
    return finalize(Film(r_sum=r, g_sum=g, b_sum=b, weight_sum=wsum))


@partial(jax.jit,
         static_argnames=("xres", "yres", "spp", "cfg", "ftype", "fradius",
                          "n_devices"))
def render_sharded(scene: Scene, camera: PerspectiveCamera, xres: int,
                   yres: int, spp: int, cfg: PathConfig = PathConfig(),
                   n_devices: Optional[int] = None, ftype: int = FILTER_BOX,
                   fradius: float = 0.5, seed=0) -> jnp.ndarray:
    """Render with pixels sharded across the device mesh.

    The image equals the single-device `render` bitwise for radius<=0.5
    filters (each pixel is owned by exactly one shard); wider filters
    differ only by float addition order at shard boundaries.
    """
    mesh = make_render_mesh(n_devices)
    n_dev = mesh.devices.size
    total = xres * yres
    lanes_per = -(-total // n_dev)  # shards pad; OOB lanes splat nowhere

    fn = shard_map(
        partial(_shard_body, xres=xres, yres=yres, spp=spp, cfg=cfg,
                ftype=ftype, fradius=fradius, lanes_per=lanes_per,
                n_shards=n_dev),
        mesh=mesh,
        in_specs=(P(), P(), P()),   # scene/camera/seed replicated
        out_specs=P(),              # film replicated after psum
        check_vma=False,
    )
    return fn(scene, camera, jnp.asarray(seed, jnp.int32))
