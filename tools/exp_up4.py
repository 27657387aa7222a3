#!/usr/bin/env python
"""up_4 SPADE block: internal attribution + space-to-depth reformulation.

Round-2 question: the full-res SPADEResBlock up_4 (80->32 @1024x768) costs
~87 ms/b4 vs a ~25 ms traffic roofline, and the fused-modulate Pallas kernel
was NEUTRAL composed — so WHERE does the time actually go?  This tool times
standalone variants with pieces knocked out, plus an exact space-to-depth
(block=2) reformulation of the whole block (ops/s2d.py) in which every
full-res tensor is stored as (N, H/2, W/2, 4C): channel counts 80/128/32/7
become 320/512/128/28, filling whole 128-lane tiles instead of padding
(the hypothesis for the roofline gap).

Equivalence of the s2d block vs the reference formulation is asserted by
``--check`` (run on CPU; also covered op-by-op in tests/test_s2d.py).

Usage:
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_up4.py
  python tools/exp_up4.py --check          # CPU numerical equivalence
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHECK = "--check" in sys.argv
if _CHECK:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hrviton_tpu.ops.s2d import (conv1x1_s2d, conv3x3_s2d, from_s2d,
                                 instance_norm_s2d, to_s2d)

B = int(os.environ.get("EXP_BATCH", "4"))
K = int(os.environ.get("EXP_ITERS", "10"))
H = int(os.environ.get("EXP_H", "1024"))
W = int(os.environ.get("EXP_W", "768"))
CIN, CMID, COUT, NH, SEG = 80, 32, 32, 128, 7
DTYPE = jnp.float32 if _CHECK else jnp.bfloat16
_rng = np.random.default_rng(0)
_EPS = 1e-5


def arr(*shape, dtype=DTYPE):
    return jnp.asarray(_rng.standard_normal(shape), dtype=dtype)


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

    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


# ---------------------------------------------------------------- weights --
def make_weights():
    w = {}
    for name, ci, co in [
            ("s_sh", SEG, NH), ("s_g", NH, CIN), ("s_b", NH, CIN),
            ("n0_sh", SEG, NH), ("n0_g", NH, CIN), ("n0_b", NH, CIN),
            ("n1_sh", SEG, NH), ("n1_g", NH, CMID), ("n1_b", NH, CMID)]:
        w[name] = (arr(3, 3, ci, co, dtype=jnp.float32) * 0.05,
                   arr(co, dtype=jnp.float32) * 0.05)
    w["conv_s"] = (arr(1, 1, CIN, COUT, dtype=jnp.float32) * 0.05, None)
    w["conv_0"] = (arr(3, 3, CIN, CMID, dtype=jnp.float32) * 0.05,
                   arr(CMID, dtype=jnp.float32) * 0.05)
    w["conv_1"] = (arr(3, 3, CMID, COUT, dtype=jnp.float32) * 0.05,
                   arr(COUT, dtype=jnp.float32) * 0.05)
    for name, c in [("ns_s", CIN), ("ns_0", CIN), ("ns_1", CMID)]:
        w[name] = arr(c, dtype=jnp.float32) * 0.1
    return w


def conv(x, wb, pad=1):
    k, b = wb
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, k.astype(x.dtype), (1, 1),
                                 ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn)
    return y if b is None else y + b.astype(x.dtype)


def inorm(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + _EPS)).astype(x.dtype)


# ------------------------------------------------------------- reference --
def spade_norm(x, seg, noise, nscale, wsh, wg, wbt, use_seg=True,
               use_noise=True):
    if use_noise:
        x = x + (noise * nscale).astype(x.dtype)
    normalized = inorm(x)
    if not use_seg:
        return normalized
    actv = jax.nn.relu(conv(seg, wsh))
    gamma = conv(actv, wg)
    beta = conv(actv, wbt)
    return normalized * (1.0 + gamma) + beta


def block_ref(x, seg, n_s, n_0, n_1, w, use_seg=True, use_noise=True,
              use_norms=True):
    def norm(x_, tag, noise, nscale):
        if not use_norms:
            return x_
        return spade_norm(x_, seg, noise, nscale, w[f"{tag}_sh"],
                          w[f"{tag}_g"], w[f"{tag}_b"], use_seg, use_noise)

    xs = norm(x, "s", n_s, w["ns_s"])
    xs = conv(xs, w["conv_s"], pad=0)
    dx = norm(x, "n0", n_0, w["ns_0"])
    dx = conv(jax.nn.leaky_relu(dx, 0.2), w["conv_0"])
    dx = norm(dx, "n1", n_1, w["ns_1"])
    dx = conv(jax.nn.leaky_relu(dx, 0.2), w["conv_1"])
    return xs + dx


# ------------------------------------------------------------------- s2d --
def _noise_term(noise2, nscale):
    """noise2: (N,H',W',4) phase-major 1-ch noise -> (..., 4C) modulation."""
    c = nscale.shape[0]
    return jnp.repeat(noise2, c, axis=-1) * jnp.tile(nscale, 4)


def spade_norm_s2d(x2, seg2, noise2, nscale, wsh, wg, wbt):
    c = nscale.shape[0]
    x2 = x2 + _noise_term(noise2, nscale).astype(x2.dtype)
    normalized = instance_norm_s2d(x2, c, _EPS)
    actv = jax.nn.relu(conv3x3_s2d(seg2, wsh[0], wsh[1], x2.dtype))
    gamma = conv3x3_s2d(actv, wg[0], wg[1], x2.dtype)
    beta = conv3x3_s2d(actv, wbt[0], wbt[1], x2.dtype)
    return normalized * (1.0 + gamma) + beta


def block_s2d(x2, seg2, n_s2, n_02, n_12, w):
    xs = spade_norm_s2d(x2, seg2, n_s2, w["ns_s"], w["s_sh"], w["s_g"],
                        w["s_b"])
    xs = conv1x1_s2d(xs, w["conv_s"][0], w["conv_s"][1])
    dx = spade_norm_s2d(x2, seg2, n_02, w["ns_0"], w["n0_sh"], w["n0_g"],
                        w["n0_b"])
    dx = conv3x3_s2d(jax.nn.leaky_relu(dx, 0.2), w["conv_0"][0],
                     w["conv_0"][1], x2.dtype)
    dx = spade_norm_s2d(dx, seg2, n_12, w["ns_1"], w["n1_sh"], w["n1_g"],
                        w["n1_b"])
    dx = conv3x3_s2d(jax.nn.leaky_relu(dx, 0.2), w["conv_1"][0],
                     w["conv_1"][1], x2.dtype)
    return xs + dx


def check():
    global B, H, W
    B, H, W = 2, 64, 48
    w = make_weights()
    x = arr(B, H, W, CIN)
    seg = arr(B, H, W, SEG)
    n_s, n_0, n_1 = (arr(B, H, W, 1, dtype=jnp.float32) for _ in range(3))
    ref = block_ref(x, seg, n_s, n_0, n_1, w)
    got = from_s2d(block_s2d(to_s2d(x), to_s2d(seg), to_s2d(n_s),
                             to_s2d(n_0), to_s2d(n_1), w), COUT)
    err = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"max |ref - s2d| = {err:.3e}  (max |ref| = {scale:.3e})")
    assert err < 2e-4 * max(scale, 1.0), "s2d block diverges from reference"
    print("check ok")


def main():
    w = make_weights()
    x = arr(B, H, W, CIN)
    seg = arr(B, H, W, SEG)
    n_s, n_0, n_1 = (arr(B, H, W, 1, dtype=jnp.float32) for _ in range(3))

    t_full = timeit("up_4 full (ref)",
                    lambda *a: block_ref(*a, w), x, seg, n_s, n_0, n_1)
    timeit("up_4 no-seg (inst-norm only, no modulation)",
           lambda *a: block_ref(*a, w, use_seg=False), x, seg, n_s, n_0, n_1)
    timeit("up_4 no-noise",
           lambda *a: block_ref(*a, w, use_noise=False), x, seg, n_s, n_0,
           n_1)
    timeit("up_4 convs-only (norms removed)",
           lambda *a: block_ref(*a, w, use_norms=False), x, seg, n_s, n_0,
           n_1)

    x2, seg2 = to_s2d(x), to_s2d(seg)
    n2s, n20, n21 = (to_s2d(n) for n in (n_s, n_0, n_1))
    t_s2d = timeit("up_4 s2d domain (exact, lanes full)",
                   lambda a, b, c, d, e: block_s2d(a, b, c, d, e, w),
                   x2, seg2, n2s, n20, n21)
    timeit("up_4 s2d incl. to/from transforms",
           lambda a, b, c, d, e: from_s2d(block_s2d(
               to_s2d(a), to_s2d(b), to_s2d(c), to_s2d(d), to_s2d(e), w),
               COUT), x, seg, n_s, n_0, n_1)
    print(f"s2d speedup: {t_full / t_s2d:.2f}x")


if __name__ == "__main__":
    check() if _CHECK else main()
