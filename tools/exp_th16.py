#!/usr/bin/env python
"""A/B the fused-unit band height _TH (8 vs 16) after the kx-lane-merged
producer dot (ROADMAP §0b follow-up).

Post-merge the unit runs at 71 TF/s padded-effective — below the 91 TF/s
sustained MXU ceiling — so ~4.5 ms/unit of per-band VPU/DMA overhead is
exposed. TH=16 halves the band count (half the DMAs, half the roll/epilogue
invocations, 2x-M dots) at the cost of ~2x VMEM scratch. The earlier
"TH=16 no help (VMEM pressure)" verdict predates the v3 unpadded interface
AND the merged producer; this re-measures it.

Kill-safety: compile the tiny shape first so a Mosaic hang dies small.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_th16.py
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
        print(f"{name:44s}    FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)
        return float("inf")
    print(f"{name:44s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


def unit(c, cout, nh=128):
    return dict(
        nscale=arr(c, scale=0.1, dtype=jnp.float32),
        wg=arr(3, 3, nh, c, scale=0.05, dtype=jnp.float32),
        bg=arr(c, scale=0.1, dtype=jnp.float32),
        wb=arr(3, 3, nh, c, scale=0.05, dtype=jnp.float32),
        bb=arr(c, scale=0.1, dtype=jnp.float32),
        wc=arr(3, 3, c, cout, scale=0.05, dtype=jnp.float32),
        bc=arr(cout, scale=0.1, dtype=jnp.float32),
    )


def fused(x, noise, actv, u):
    return sb.fused_spade_conv(x, noise, u["nscale"], actv, u["wg"],
                               u["bg"], u["wb"], u["bb"], u["wc"], u["bc"],
                               pre_act="leaky0.2")


def run(tag, b, h, w, c, cout, check=False):
    u = unit(c, cout)
    x = arr(b, h, w, c)
    noise = arr(b, h, w, 1, dtype=jnp.float32)
    actv = arr(b, h, w, 128)
    if check:
        got = np.asarray(jax.jit(fused)(x, noise, actv, u))
        want = np.asarray(jax.jit(lambda *a: sb.spade_conv_ref(
            a[0], a[1], u["nscale"], a[2], u["wg"], u["bg"], u["wb"],
            u["bb"], u["wc"], u["bc"], pre_act="leaky0.2"))(x, noise, actv))
        err = np.abs(got.astype(np.float32) - want.astype(np.float32)).max()
        tol = 5e-2  # bf16 inputs/products
        verdict = "ok" if err < tol else "*** FAIL ***"
        print(f"{tag} check: max|fused-ref| = {err:.3e} ({verdict})",
              flush=True)
        assert err < tol, f"{tag}: fused kernel error {err:.3e} >= {tol}"
    return timeit(tag, fused, x, noise, actv, u)


def main():
    ths = tuple(int(t) for t in
                os.environ.get("EXP_TH", "8,16").split(","))
    orig_th = sb._TH
    try:
        for th in ths:
            sb._TH = th
            print(f"--- _TH = {th}", flush=True)
            run(f"TH{th} smoke 64x128 c80", 1, 64, 128, 80, 32, check=True)
            run(f"TH{th} up_4 n0 80->32 1024x768", B, 1024, 768, 80, 32)
            run(f"TH{th} up_4 n1 32->32 1024x768", B, 1024, 768, 32, 32)
            run(f"TH{th} up_3 n0 144->64 512x384", B, 512, 384, 144, 64)
            run(f"TH{th} up_3 n1 64->64 512x384", B, 512, 384, 64, 64)
    finally:
        sb._TH = orig_th
    # NOTE: min-of-2 repetitions over the tunnel carries ~1% run-to-run
    # noise; differences under ~2% are a NEUTRAL verdict, not a win.


if __name__ == "__main__":
    main()
