#!/usr/bin/env python
"""Isolate the TPU disagreement: pallas vs tensor path on the bench mesh,
full mesh (2 superblocks) vs truncated mesh (1 superblock)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fountain_tpu.geometry.pallas_tri import (SB, mt_intersect_pallas,
                                                  pack_features_pallas)
    from fountain_tpu.geometry.tensor_tri import build_tri_features, mt_intersect
    from fountain_tpu.io.ply import load_ply

    mesh = load_ply("data/rounded_cube.ply")
    tv_full = mesh.positions[mesh.indices]
    print(f"faces={len(tv_full)} SB={SB}")

    rng = np.random.default_rng(7)
    n = 4096
    o = jnp.asarray(rng.normal(size=(n, 3)) * 30.0, jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    t_max = jnp.full((n,), jnp.inf)

    for name, tv in (("1sb", tv_full[: SB - 100]), ("2sb", tv_full)):
        qd = pack_features_pallas(tv)
        feat = build_tri_features(np.asarray(tv))
        fp = jax.jit(lambda o, d, t: mt_intersect_pallas(qd, o, d, t,
                                                         sort=True))
        ft = jax.jit(lambda o, d, t: mt_intersect(feat, o, d, t))
        tp, ip, okp = jax.block_until_ready(fp(o, d, t_max))
        tt, it, okt = jax.block_until_ready(ft(o, d, t_max))
        tp, ip, okp = map(np.asarray, (tp, ip, okp))
        tt, it, okt = map(np.asarray, (tt, it, okt))
        both = okp & okt
        agree_ok = (okp == okt).mean()
        agree_idx = (ip[both] == it[both]).mean() if both.any() else 1.0
        terr = (np.abs(tp[both] - tt[both]) /
                np.maximum(np.abs(tt[both]), 1e-9)).max() if both.any() else 0
        print(f"{name}: ok_agree={agree_ok:.6f} idx_agree={agree_idx:.6f} "
              f"t_relerr_max={terr:.2e} phantom={int((okp & ~okt).sum())} "
              f"missing={int((~okp & okt).sum())} hits={int(okt.sum())}")
        if name == "2sb" and both.any():
            bad = both & (ip != it)
            if bad.any():
                print("  sample disagreements (pallas_idx, tensor_idx, "
                      "t_pallas, t_tensor):")
                for k in np.where(bad)[0][:8]:
                    print(f"   lane {k}: {ip[k]} {it[k]} {tp[k]:.6f} "
                          f"{tt[k]:.6f}")


if __name__ == "__main__":
    main()
