"""Test harness: force a virtual 8-device CPU mesh before jax initializes.

This is the TPU-world analog of a fake backend — mesh/sharding/collective paths
are exercised portably (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests must not depend on (or hog) the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: XLA-on-CPU compiles dominate test wall-clock
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
