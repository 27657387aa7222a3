#!/usr/bin/env python
"""Measure achievable HBM bandwidth on this chip with trivial streaming ops.

Calibrates every roofline claim in ROADMAP.md: if the achievable number is
far below the v5e spec sheet (819 GB/s), the 'gap to roofline' of the conv/
norm kernels must be judged against the measured ceiling, not the spec."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("PROF_ITERS", "10"))


def timeit(name, fn, nbytes, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:44s} {per * 1e3:8.2f} ms  {nbytes / per / 1e9:8.1f} GB/s",
          flush=True)


def main():
    for mb, shape in [(256, (64, 1024, 768, 4)), (805, (4, 1024, 768, 128))]:
        x = jnp.zeros(shape, jnp.bfloat16)
        n = x.size * 2
        timeit(f"abs-scale bf16 {mb}M (r+w)", lambda a: jnp.abs(a) * 2.0, 2 * n, x)
    x = jnp.zeros((4, 1024, 768, 128), jnp.float32)
    timeit("abs-scale f32 1.6G (r+w)", lambda a: jnp.abs(a) * 2.0, 2 * x.size * 4, x)
    x = jnp.zeros((4, 1024, 768, 128), jnp.bfloat16)
    timeit("reduce-sum bf16 805M (r)", lambda a: a * 1.0 if False else
           jnp.sum(jnp.abs(a), axis=-1, keepdims=True) * 1.0, x.size * 2, x)


if __name__ == "__main__":
    main()
