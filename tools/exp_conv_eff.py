#!/usr/bin/env python
"""MXU efficiency of the SPADE modulation convs at production shape.

The up_4 block's FLOPs are dominated by conv_gamma/conv_beta (3x3, 128->80,
1024x768, b4) — 580 GF each. This measures what XLA's conv achieves vs the
pure-matmul MXU ceiling at the same (M, K, N), plus variants that could guide
a restructuring:
  * conv3x3 128->80 (the real shape; N pads 80->128)
  * conv3x3 128->128 (lane-aligned output)
  * conv3x3 128->160 (gamma+beta merged in one conv)
  * dot (M=B*H*W, K=128, N=80/128): the no-halo ceiling
  * conv1x1 128->80: conv overhead without the 9-tap halo
All bf16 inputs, f32 accumulate (preferred_element_type), salted lax.map.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 4, 1024, 768
K = int(os.environ.get("PROF_ITERS", "20"))
_rng = np.random.default_rng(0)
salts = jnp.arange(K, dtype=jnp.float32) * 1e-6


def bench(name, fn, *args, flops=None):
    many = jax.jit(lambda *a: jnp.sum(jax.lax.map(
        lambda s: jnp.mean(fn(*[x + s.astype(x.dtype) for x in a])
                           .astype(jnp.float32)), salts)))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    eff = f"  {flops / per / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:44s} {per * 1e3:8.2f} ms{eff}", flush=True)


def arr(shape):
    return jnp.asarray(_rng.standard_normal(shape), jnp.bfloat16)


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def main():
    x = arr((B, H, W, 128))
    M = B * H * W
    for n in (80, 128, 160):
        w = arr((3, 3, 128, n))
        bench(f"conv3x3 128->{n} @{H}x{W} b{B}", conv, x, w,
              flops=2 * M * 9 * 128 * n)
    w1 = arr((1, 1, 128, 80))
    bench("conv1x1 128->80", conv, x, w1, flops=2 * M * 128 * 80)
    xm = arr((M, 128))
    for n in (80, 128):
        wm = arr((128, n))
        bench(f"dot {M}x128x{n} (MXU ceiling)",
              lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
              .astype(jnp.bfloat16), xm, wm, flops=2 * M * 128 * n)
    # the full modulation chain of ONE norm as XLA sees it in-block
    seg = arr((B, H, W, 7))
    ws = arr((3, 3, 7, 128))
    wg = arr((3, 3, 128, 80))
    wb = arr((3, 3, 128, 80))
    xin = arr((B, H, W, 80))

    def spade_chain(xi, s, a, g, bta):
        actv = jax.nn.relu(conv(s, a))
        gamma = conv(actv, g)
        beta = conv(actv, bta)
        mu = jnp.mean(xi.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(xi.astype(jnp.float32), axis=(1, 2), keepdims=True)
        normalized = ((xi.astype(jnp.float32) - mu) *
                      jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
        return normalized * (1 + gamma) + beta

    bench("full SPADE norm chain 80ch (3 convs+IN)", spade_chain,
          xin, seg, ws, wg, wb,
          flops=2 * M * 9 * (7 * 128 + 2 * 128 * 80))


if __name__ == "__main__":
    main()
