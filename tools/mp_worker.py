#!/usr/bin/env python
"""Worker for the two-process DCN rendezvous test (tests/test_multiproc.py).

Each process owns ONE virtual CPU device; ``jax.distributed.initialize``
(via parallel.shard.init_distributed) performs the cross-process
rendezvous the reference never needed (single-process rayon,
SURVEY.md §2 communication-backend row), and ``render_sharded`` then runs
over the GLOBAL two-device mesh — the film psum crosses the process
boundary (Gloo CPU collectives standing in for DCN).

Usage: mp_worker.py <port> <num_processes> <process_id> <out.npy>
"""
import os
import sys

port, nproc, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from fountain_tpu.parallel.shard import init_distributed, render_sharded  # noqa: E402
from fountain_tpu.integrator.path import PathConfig  # noqa: E402
from fountain_tpu.io.pbrt import load_pbrt  # noqa: E402

proc = init_distributed(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc  # global mesh spans both processes

scene, cam, st = load_pbrt("testscenes/furnace_empty.pbrt")
cfg = PathConfig(max_depth=3, rr_threshold=0.0, nee=True)
img = np.asarray(render_sharded(scene, cam, 16, 16, 4, cfg))
if proc == 0:
    np.save(out_path, img)
print(f"proc {proc}: rendered {img.shape}, mean {img.mean():.6f}",
      flush=True)
