#!/usr/bin/env python
"""A/B: SPADEResBlock (up_4 / up_3 shapes, eval) with the fused SPADE-norm
Pallas kernel (ops/spade_fused.py) on vs off, on the real TPU.

Compiles a small same-structure shape first (kill-safe Mosaic probe), checks
numerics vs the unfused path there, then times the production shapes with the
scan-salted single-jit method (the only reliable timing over the axon tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models.spade import SPADEResBlock
from hrviton_tpu.ops.spade_fused import fast_spade

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
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


def block_io(h, w, cin):
    x = jnp.asarray(_rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
    seg = jnp.asarray(_rng.standard_normal((B, h, w, 7)), jnp.bfloat16)
    return x, seg


def run_shape(tag, h, w, cin, cout, check=False):
    blk = SPADEResBlock(cin, cout, norm_g="spectralaliasinstance",
                        gen_semantic_nc=7)
    x, seg = block_io(h, w, cin)
    v = bf16_params(jax.jit(lambda k: blk.init(
        {"params": k, "noise": k}, x[:1], seg[:1], train=False))(
        jax.random.PRNGKey(0)))
    nk = jax.random.PRNGKey(1)

    def run(v, x, seg):
        return blk.apply(v, x, seg, train=False, rngs={"noise": nk})

    if check:
        with fast_spade(False):
            base = np.asarray(jax.jit(run)(v, x, seg), np.float32)
        with fast_spade(True):
            fused = np.asarray(jax.jit(run)(v, x, seg), np.float32)
        d = np.abs(fused - base)
        print(f"{tag}: max|diff| fused vs XLA = {d.max():.5f} "
              f"(mean {d.mean():.6f})", flush=True)
        return

    with fast_spade(False):
        timeit(f"{tag} (XLA)", run, v, x, seg)
    with fast_spade(True):
        timeit(f"{tag} (fused spade-norm)", run, v, x, seg)


def main():
    # kill-safe probe: smallest ELIGIBLE shape (h>=256, w>=96) — compiles the
    # Mosaic kernel structure fast and checks numerics before the big shapes
    run_shape("probe/check 256x96 16->8", 256, 96, 16, 8, check=True)
    run_shape("check 256x192 80->32", 256, 192, 80, 32, check=True)
    if int(os.environ.get("PROF_FULL", "1")):
        run_shape("up_4 1024x768 80->32", 1024, 768, 80, 32)
        run_shape("up_3  512x384 144->64", 512, 384, 144, 64)


if __name__ == "__main__":
    main()
