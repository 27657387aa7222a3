#!/usr/bin/env python
"""Measure sustained MXU throughput (bf16, f32-accumulate) on this chip, at a
large square matmul and at the gamma-conv-like skinny shapes. Calibrates the
compute rooflines in ROADMAP.md the same way exp_hbm_bw.py calibrates HBM."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("PROF_ITERS", "10"))
_rng = np.random.default_rng(0)


def timeit(name, fn, flops, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) for x in a])
            return jnp.mean(jnp.abs(out).astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:52s} {per * 1e3:8.2f} ms  {flops / per / 1e12:7.1f} TF/s",
          flush=True)


def mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)


def main():
    for (m, k, n) in [(4096, 4096, 4096), (8192, 4096, 4096),
                      (786432, 128, 128), (786432, 1152, 128),
                      (98304, 1152, 128), (12288, 384, 256)]:
        a = jnp.asarray(_rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(_rng.standard_normal((k, n)), jnp.bfloat16)
        timeit(f"matmul bf16 ({m}x{k})x({k}x{n})", mm, 2 * m * k * n, a, b)


if __name__ == "__main__":
    main()
