"""Test harness: force a virtual 8-device CPU mesh before jax initializes.

This is the TPU-world analog of a fake backend — mesh/sharding/collective paths
are exercised portably (SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: XLA-on-CPU compiles dominate test wall-clock
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# a sitecustomize in this image forces jax_platforms to "axon,cpu" and ignores
# the JAX_PLATFORMS env var — override via config so tests run on 8 virtual
# CPU devices and never touch (or depend on) the TPU
jax.config.update("jax_platforms", "cpu")

# the DEFAULT conv/matmul precision is bf16-class (~3e-3 error vs torch);
# golden/parity tests need true f32
jax.config.update("jax_default_matmul_precision", "highest")
