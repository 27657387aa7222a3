#!/usr/bin/env python
"""Isolated timing of fused_spade_modulate vs its XLA reference at the up_4
norm shape, to decompose where the in-context milliseconds go."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import importlib
sf = importlib.import_module("hrviton_tpu.ops.spade_fused")

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
H, W = 1024, 768
C = int(os.environ.get("PROF_C", "80"))
NH = 128
_rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim == 4
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / K * 1e3:9.2f} ms", flush=True)


def main():
    x = jnp.asarray(_rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    noise = jnp.asarray(_rng.standard_normal((B, H, W, 1)), jnp.float32)
    nscale = jnp.asarray(_rng.standard_normal((C,)) * 0.1, jnp.float32)
    actv = jnp.asarray(_rng.standard_normal((B, H, W, NH)), jnp.bfloat16)
    wg = jnp.asarray(_rng.standard_normal((3, 3, NH, C)) * 0.05, jnp.bfloat16)
    bg = jnp.asarray(_rng.standard_normal((C,)), jnp.float32)
    wb = jnp.asarray(_rng.standard_normal((3, 3, NH, C)) * 0.05, jnp.bfloat16)
    bb = jnp.asarray(_rng.standard_normal((C,)), jnp.float32)
    args = (x, noise, nscale, actv, wg, bg, wb, bb)

    timeit(f"modulate ref XLA   {H}x{W} C{C}", sf._modulate_ref, *args)
    timeit(f"modulate fused     {H}x{W} C{C}", sf._modulate_pallas, *args)
    # kernel-only (stats precomputed but inside jit anyway — measures the
    # pallas_call share): time the pallas call with fixed mu/rsig by reusing
    # _modulate_pallas with noise=0 keeps same structure; skip.


if __name__ == "__main__":
    main()
