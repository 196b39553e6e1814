#!/usr/bin/env python
"""Validate + time the Pallas sweep at a given MXU precision on real TPU.

Usage: FOUNTAIN_TPU_MXU_PRECISION={default,high,highest} python
tools/precision_sweep.py

Checks (1) the 100k-interior-ray watertight gate through the Pallas path,
(2) t agreement vs the HIGHEST-precision tensor path, (3) sweep wall time.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")


def main():
    from fountain_tpu.geometry.pallas_tri import (mt_intersect_pallas,
                                                  pack_features_pallas)
    from fountain_tpu.io.ply import load_ply

    prec = "bf16x6-k96"
    mesh = load_ply("data/rounded_cube.ply")
    tv = mesh.positions[mesh.indices]
    qd = pack_features_pallas(tv)

    n = 100_000
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((n, 3), jnp.float32)
    dj = jnp.asarray(d)
    t_max = jnp.full((n,), jnp.inf)

    f = jax.jit(lambda o, d, t: mt_intersect_pallas(qd, o, d, t, sort=False))
    t, idx, ok = f(o, dj, t_max)
    leaks = int((~np.asarray(ok)).sum())

    # t-accuracy vs float64 ground truth on a sample
    tv64 = np.asarray(tv, np.float64)
    v0, e1, e2 = tv64[:, 0], tv64[:, 1] - tv64[:, 0], tv64[:, 2] - tv64[:, 0]
    nrm = np.cross(e1, e2)
    k = (v0 * nrm).sum(-1)
    m = 2000
    dn = d[:m].astype(np.float64)
    idxn = np.asarray(idx[:m])
    t_ref = k[idxn] / (dn * nrm[idxn]).sum(-1)  # o=0
    terr = np.abs(np.asarray(t[:m], np.float64) - t_ref) / np.abs(t_ref)

    jax.block_until_ready(f(o, dj, t_max))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(o, dj, t_max)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10

    print(f"precision={prec} leaks={leaks}/{n} "
          f"t_relerr_max={terr.max():.2e} t_relerr_med={np.median(terr):.2e} "
          f"sweep={dt*1e3:.2f}ms ({n/dt/1e6:.1f} Mrays/s vs 4332 faces)")


if __name__ == "__main__":
    main()
