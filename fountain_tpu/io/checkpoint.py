"""Checkpoint / resume for long renders and optimization runs.

The reference reserved (but never implemented) mid-stream restart:
``Sampler::set_sample_number`` (src/sampler/mod.rs:53, the
``unimplemented!`` at src/sampler/random.rs:73-75). The TPU design makes
exact resume trivial instead of hard: the RNG is a pure counter hash of
(lane, sample index) — core.rng — so the complete state of a partially
rendered frame is just

    (r_sum, g_sum, b_sum, weight_sum, next_sample, spp_total, seed)

plus whatever parameter tables an optimization loop owns. Rendering
samples [0, k) + checkpoint + [k, n) is bitwise identical to [0, n) in
one run (tests/test_checkpoint.py).

Format: a single .npz (dependency-free, like io.exr) with a version tag.
Optimizer/parameter pytrees are stored as flattened leaves keyed
``param_<i>`` with the treedef's structure string checked on load.
"""
from __future__ import annotations

import json
from typing import Any, Optional, Tuple

import jax
import numpy as np

from fountain_tpu.scene.film import Film

_MAGIC = "fountain-tpu-ckpt"
_VERSION = 1


def save_checkpoint(path: str, film: Film, next_sample: int,
                    spp_total: int, seed: int = 0,
                    params: Any = None) -> None:
    """Write a resumable render checkpoint (film accumulators + counters
    + optional parameter pytree)."""
    arrays = {
        "r_sum": np.asarray(film.r_sum),
        "g_sum": np.asarray(film.g_sum),
        "b_sum": np.asarray(film.b_sum),
        "weight_sum": np.asarray(film.weight_sum),
    }
    meta = {
        "magic": _MAGIC,
        "version": _VERSION,
        "next_sample": int(next_sample),
        "spp_total": int(spp_total),
        "seed": int(seed),
        "n_params": 0,
        "treedef": None,
    }
    if params is not None:
        leaves, treedef = jax.tree.flatten(params)
        meta["n_params"] = len(leaves)
        meta["treedef"] = str(treedef)
        for i, leaf in enumerate(leaves):
            arrays[f"param_{i}"] = np.asarray(leaf)
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str, params_like: Any = None
                    ) -> Tuple[Film, int, int, int, Optional[Any]]:
    """Read a checkpoint -> (film, next_sample, spp_total, seed, params).

    ``params_like``: a pytree with the same structure as the saved params
    (e.g. the freshly built scene's parameter tables); required to
    reconstruct the pytree from its flattened leaves. With the default
    None, the raw leaf list is returned instead (or None if none saved).
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode("utf-8"))
        if meta.get("magic") != _MAGIC:
            raise ValueError(f"{path}: not a fountain-tpu checkpoint")
        if meta["version"] > _VERSION:
            raise ValueError(
                f"{path}: checkpoint version {meta['version']} is newer "
                f"than this build ({_VERSION})")
        film = Film(r_sum=np.copy(z["r_sum"]), g_sum=np.copy(z["g_sum"]),
                    b_sum=np.copy(z["b_sum"]),
                    weight_sum=np.copy(z["weight_sum"]))
        n = meta["n_params"]
        params: Optional[Any] = None
        if n:
            leaves = [np.copy(z[f"param_{i}"]) for i in range(n)]
            if params_like is not None:
                treedef = jax.tree.structure(params_like)
                if treedef.num_leaves != n:
                    raise ValueError(
                        f"{path}: checkpoint has {n} param leaves, "
                        f"params_like has {treedef.num_leaves}")
                params = jax.tree.unflatten(treedef, leaves)
            else:
                params = leaves
    return (film, meta["next_sample"], meta["spp_total"], meta["seed"],
            params)
