"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use the host-platform virtual-device trick (the
"fake backend" the reference never needed, SURVEY.md §4): a 1-chip dev box
can still validate pjit/shard_map partitioning on an 8-device CPU mesh.

Note: in this environment the remote-TPU ("axon") plugin ignores the
JAX_PLATFORMS env var, so we also force CPU via jax.config — otherwise every
op dispatch round-trips to the remote TPU and tests crawl.
"""
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the attached-sampling gradient programs
# (test_grad combined test) take tens of minutes of XLA-CPU/LLVM compile;
# cache them so only the first suite run on a machine pays it.
jax.config.update("jax_compilation_cache_dir", "/tmp/fountain_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
