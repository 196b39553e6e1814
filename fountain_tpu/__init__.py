"""fountain-tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``akofke/fountain`` PBRT-v3 renderer (reference: /root/reference), built
wavefront-first for TPU:

- batched SoA ray queues instead of per-ray recursion
  (reference: src/integrator/path.rs:25-95 iterative loop),
- ``lax.switch``/masked evaluate-all instead of trait-object dispatch
  (reference: src/reflection/bsdf.rs:26 ``&dyn BxDF``),
- counter-based per-lane RNG instead of per-tile reseeded Xoshiro
  (reference: src/sampler/random.rs:61-67),
- scatter-add film accumulation instead of mutex-guarded tiles
  (reference: src/film.rs:121-132),
- LBVH from Morton codes instead of sequential recursive BVH build
  (reference: src/bvh.rs:66-120, src/morton.rs:3-14),
- the whole estimator differentiable w.r.t. material / texture / emitter
  parameters (the reference is not differentiable at all).
"""

__version__ = "0.1.0"

from fountain_tpu.core import vecmath, sampling, spectrum, transform, rng  # noqa: F401
