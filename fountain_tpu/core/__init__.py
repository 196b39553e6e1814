"""Core math & numerics: vectors, transforms, bounds, spectrum, sampling, RNG.

TPU-native analog of the reference L0/L1 layers
(src/math.rs, src/geometry/, src/spectrum/, src/sampling.rs, src/sampler/).
Everything operates on batched ``jnp`` arrays with a trailing component axis.
"""
