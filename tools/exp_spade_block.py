#!/usr/bin/env python
"""Isolated A/B of the fused {SPADE-norm -> act -> conv} unit kernel
(ops/spade_block.py) vs the XLA chain it replaces, at up_4/up_3 shapes.

Per tools/exp_fs_sites.py the ENTIRE composed loss of the per-norm kernel
(17.0 -> 15.5 img/s) sits at up_4's three norm sites — XLA's modulate-into-
conv fusion is worth ~8 ms/site at 1024x768 — so the consumer conv must live
INSIDE the kernel. This measures whether the unit kernel beats the XLA chain
including its padding/xn/stats overheads.

Mosaic kill-safety: every kernel variant is compiled at a tiny shape first
(same block structure, small grid) so a pathological compile hangs the small
case, not the 10-minute full-shape one.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_spade_block.py
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
        print(f"{name:52s}    FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)
        return float("inf")
    print(f"{name:52s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


def make_unit(c, cout, nh=128, ksize=3):
    return dict(
        nscale=arr(c, scale=0.1, dtype=jnp.float32),
        wg=arr(3, 3, nh, c, scale=0.05, dtype=jnp.float32),
        bg=arr(c, scale=0.1, dtype=jnp.float32),
        wb=arr(3, 3, nh, c, scale=0.05, dtype=jnp.float32),
        bb=arr(c, scale=0.1, dtype=jnp.float32),
        wc=arr(ksize, ksize, c, cout, scale=0.05, dtype=jnp.float32),
        bc=arr(cout, scale=0.1, dtype=jnp.float32),
    )


def fused(x, noise, actv, u, pre_act="leaky0.2", residual=None):
    return sb.fused_spade_conv(x, noise, u["nscale"], actv, u["wg"],
                               u["bg"], u["wb"], u["bb"], u["wc"], u["bc"],
                               pre_act=pre_act, residual=residual)


def ref(x, noise, actv, u, pre_act="leaky0.2"):
    return sb.spade_conv_ref(x, noise, u["nscale"], actv, u["wg"], u["bg"],
                             u["wb"], u["bb"], u["wc"], u["bc"],
                             pre_act=pre_act)


def bench_shape(tag, b, h, w, c, cout, check=False):
    u = make_unit(c, cout)
    x = arr(b, h, w, c)
    noise = arr(b, h, w, 1, dtype=jnp.float32)
    actv = arr(b, h, w, 128)
    if check:
        got = np.asarray(jax.jit(fused)(x, noise, actv, u))
        want = np.asarray(jax.jit(
            lambda *a: ref(*a, u))(x, noise, actv))
        err = np.abs(got.astype(np.float32) - want.astype(np.float32)).max()
        print(f"{tag} check: max|fused-ref| = {err:.3e}", flush=True)
    t_ref = timeit(f"{tag} XLA chain (norm+mod+leaky+conv)",
                   lambda a, n_, v: ref(a, n_, v, u), x, noise, actv)
    t_fus = timeit(f"{tag} fused unit kernel (incl pad/stats)",
                   lambda a, n_, v: fused(a, n_, v, u), x, noise, actv)
    if t_fus < float("inf"):
        print(f"{tag} speedup: {t_ref / t_fus:.2f}x", flush=True)


def main():
    # kill-safety: tiny-shape compile first (same kernel structure)
    print("--- small-shape compile smoke (64x128)", flush=True)
    bench_shape("smoke 64x128 c80", 1, 64, 128, 80, 32, check=True)
    print("--- up_4 unit shapes (1024x768)", flush=True)
    bench_shape("up_4 n0+conv0 80->32", B, 1024, 768, 80, 32)
    bench_shape("up_4 n1+conv1 32->32", B, 1024, 768, 32, 32)
    print("--- up_3 unit shapes (512x384)", flush=True)
    bench_shape("up_3 n0+conv0 144->64", B, 512, 384, 144, 64)
    bench_shape("up_3 n1+conv1 64->64", B, 512, 384, 64, 64)


def main_th():
    """Row-tile sweep at the up_4 norm_0 unit shape. Round-1 lesson
    (ops/spade_fused.py): per-grid-step overhead dominated small tiles;
    for this kernel TH=8 measured best (ROADMAP §0)."""
    u = make_unit(80, 32)
    x = arr(B, 1024, 768, 80)
    noise = arr(B, 1024, 768, 1, dtype=jnp.float32)
    actv = arr(B, 1024, 768, 128)
    for th in (8, 16):
        try:
            sb._TH = th
            bench_shape(f"smoke TH={th}", 1, 64, 128, 80, 32)  # compile smoke
            timeit(f"up_4 n0 unit TH={th}",
                   lambda a, n_, v: fused(a, n_, v, u), x, noise, actv)
        finally:
            sb._TH = 8


if __name__ == "__main__":
    main_th() if os.environ.get("EXP_MODE") == "th" else main()
