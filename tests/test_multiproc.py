"""Two-process DCN rendezvous: the communication-backend proof.

Spawns two REAL processes (1 virtual CPU device each), runs
``jax.distributed.initialize`` through ``parallel.shard.init_distributed``
(coordinator rendezvous + cross-process init barrier), renders the furnace
via ``render_sharded`` over the GLOBAL 2-device mesh — the film psum
crosses the process boundary over Gloo CPU collectives (the DCN stand-in
on this 1-chip box) — and checks the result matches the single-process
render bitwise (counter-based RNG ⇒ device-count invariance).

The reference has no multi-process story at all (SURVEY.md §2); this is
the round-5 item proving the repo's ``jax.distributed`` path actually
executes with process_count > 1.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tools", "mp_worker.py")
    out = str(tmp_path / "film0.npy")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), "2", str(i), out],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in (0, 1)]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    img2 = np.load(out)

    # single-process reference in THIS process (8 virtual devices, but
    # render() uses one) — counter RNG makes the image independent of the
    # device/process decomposition
    from fountain_tpu.integrator.path import PathConfig
    from fountain_tpu.integrator.render import render
    from fountain_tpu.io.pbrt import load_pbrt
    scene, cam, st = load_pbrt(os.path.join(repo,
                                            "testscenes/furnace_empty.pbrt"))
    cfg = PathConfig(max_depth=3, rr_threshold=0.0, nee=True)
    img1 = np.asarray(render(scene, cam, 16, 16, 4, cfg))
    np.testing.assert_allclose(img2, img1, rtol=1e-6, atol=1e-6)
