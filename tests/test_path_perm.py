"""Keep-permuted bounce loop: equivalence with the scan path.

The TPU bounce loop reorders the WHOLE wavefront carry by a Morton key
once per bounce (integrator.path._permute_state) so the intersection
sweeps, shading gathers, and NEE all run on a spatially-coherent
live-lanes-first wave, with a single radiance unsort at the end. Because
the RNG counters (lane, sample) travel with the permutation, the result
must equal the unpermuted scan path except for float summation order.

Forced on CPU via the "forceperm" debug switch (the TPU-only gate in
trace_paths); covers forward radiance AND parameter gradients through the
permutation's custom VJP (core.gather.permute_rows).
"""
import jax
import jax.numpy as jnp
import numpy as np

import fountain_tpu.integrator.path as P
from fountain_tpu.integrator.path import PathConfig
from fountain_tpu.integrator.render import render_wave
from fountain_tpu.io.pbrt import load_pbrt


def _run(scene, cam, tv, seed, cfg):
    s = scene._replace(textures=scene.textures._replace(value=tv))
    fx, fy, r = render_wave(s, cam, 8, 8, 0, cfg, seed=seed)
    return (r.x + r.y + r.z).sum() / 3.0, r


def test_permuted_bounce_loop_matches_scan():
    scene, cam, st = load_pbrt("testscenes/furnace_empty.pbrt")
    cfg = PathConfig(max_depth=3, rr_threshold=0.0, nee=True)
    tv = scene.textures.value

    v0, g0 = jax.value_and_grad(
        lambda t: _run(scene, cam, t, 0, cfg)[0])(tv)
    _, r0 = _run(scene, cam, tv, 0, cfg)
    P._DBG_SG.add("forceperm")
    try:
        v1, g1 = jax.value_and_grad(
            lambda t: _run(scene, cam, t, 0, cfg)[0])(tv)
        _, r1 = _run(scene, cam, tv, 0, cfg)
    finally:
        P._DBG_SG.discard("forceperm")

    np.testing.assert_allclose(np.asarray(r0.stack()),
                               np.asarray(r1.stack()), atol=1e-5)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)
