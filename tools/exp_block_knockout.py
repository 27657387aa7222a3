#!/usr/bin/env python
"""In-kernel knockout attribution of the fused SPADE-conv unit
(ops/spade_block.py): where do 22.4 ms go when the MXU floor is ~13?

Each variant statically removes ONE stage of the kernel (timing-only, wrong
numerics) via the private `_knock` hook; the delta vs the full kernel
attributes that stage. Suspects per ROADMAP §0b: the f32 product rolls
(sublane shuffles, 6 per grid step), the modulate epilogue, the actv halo
DMA, and the dots themselves.

Mosaic kill-safety: every variant compiles at a tiny shape first.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_block_knockout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.ops import spade_block as sb

B = int(os.environ.get("EXP_BATCH", "4"))
K = int(os.environ.get("EXP_ITERS", "10"))
DTYPE = jnp.bfloat16
_rng = np.random.default_rng(0)

KNOCKS = [
    (),                    # full kernel (baseline)
    ("actv_dma",),         # no halo DMA of conv_shared's actv
    ("prod_dots",),        # no gamma/beta dots (incl. their rolls + relu concat)
    ("prod_rolls",),       # gamma/beta dots, products NOT rolled
    ("normalize",),        # no f32 normalize (stats math)
    ("modulate",),         # no gamma/beta epilogue mul/add
    ("cons_dots",),        # no consumer conv dot (incl. its rolls + concat)
    ("cons_rolls",),       # consumer dot, products NOT rolled
    ("prod_rolls", "cons_rolls"),   # all 6 rolls gone
]


def arr(*shape, scale=1.0, dtype=DTYPE):
    return jnp.asarray(_rng.standard_normal(shape) * scale, dtype=dtype)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    try:
        float(many(*args))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(many(*args))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:
        print(f"{name:46s}    FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)
        return float("inf")
    print(f"{name:46s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


def run_shape(tag, b, h, w, c, cout):
    nscale = arr(c, scale=0.1, dtype=jnp.float32)
    wg = arr(3, 3, 128, c, scale=0.05, dtype=jnp.float32)
    bg = arr(c, scale=0.1, dtype=jnp.float32)
    wb = arr(3, 3, 128, c, scale=0.05, dtype=jnp.float32)
    bb = arr(c, scale=0.1, dtype=jnp.float32)
    wc = arr(3, 3, c, cout, scale=0.05, dtype=jnp.float32)
    bc = arr(cout, scale=0.1, dtype=jnp.float32)
    x = arr(b, h, w, c)
    noise = arr(b, h, w, 1, dtype=jnp.float32)
    actv = arr(b, h, w, 128)

    base = None
    for knock in KNOCKS:
        kn = "+".join(knock) if knock else "FULL"

        def f(x_, n_, a_, knock=knock):
            return sb.fused_spade_conv(x_, n_, nscale, a_, wg, bg, wb, bb,
                                       wc, bc, pre_act="leaky0.2",
                                       _knock=knock)
        t = timeit(f"{tag} {kn}", f, x, noise, actv)
        if base is None:
            base = t
        elif t < float("inf"):
            print(f"  -> attributed: {1e3 * (base - t):7.2f} ms", flush=True)


def main():
    print("--- small-shape compile smoke (64x128)", flush=True)
    run_shape("smoke c80", 1, 64, 128, 80, 32)
    print("--- up_4 n0 unit (1024x768 80->32)", flush=True)
    run_shape("up_4 n0", B, 1024, 768, 80, 32)


if __name__ == "__main__":
    main()
