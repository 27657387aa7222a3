#!/usr/bin/env python
"""Experiment: where do the SPADE full-res block's milliseconds go on v5e?

Times isolated pieces of the up_4-sized workload (1024x768, 80->32 channels,
batch 4) inside one jit (lax.map over K salts + checksum readback — the only
reliable timing method over the axon tunnel; see tools/profile_components.py).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_spade_perf.py
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
from hrviton_tpu.nn.layers import Conv2d, InstanceNorm2d

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
H, W = 1024, 768
DTYPE = jnp.bfloat16
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
    per = best / K
    print(f"{name:52s} {per * 1e3:9.2f} ms/batch", flush=True)
    return per


def arr(h, w, c, dtype=DTYPE):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype=dtype)


def main():
    k = jax.random.PRNGKey(0)
    x80 = arr(H, W, 80)
    x128 = arr(H, W, 128)
    seg = arr(H, W, 7)

    # --- full current block -------------------------------------------------
    blk = SPADEResBlock(80, 32, norm_g="spectralaliasinstance", gen_semantic_nc=7)
    bv = bf16_params(jax.jit(lambda key: blk.init(
        {"params": key, "noise": key}, x80, seg, train=False))(k))
    nk = jax.random.PRNGKey(1)
    timeit("SPADEResBlock 80->32 (current)",
           lambda xx, ss: blk.apply(bv, xx, ss, train=False,
                                    rngs={"noise": nk}), x80, seg)

    # --- individual costs ---------------------------------------------------
    timeit("jax.random.normal (B,H,W,1) threefry",
           lambda s: jax.random.normal(nk, (B, H, W, 1), jnp.float32) + s[..., :1] * 0,
           seg)
    rbgk = jax.random.key(1, impl="rbg")
    timeit("jax.random.normal (B,H,W,1) rbg",
           lambda s: jax.random.normal(rbgk, (B, H, W, 1), jnp.float32) + s[..., :1] * 0,
           seg)

    inorm = InstanceNorm2d()
    iv = inorm.init(k, x80)
    timeit("InstanceNorm2d 80ch", lambda xx: inorm.apply(iv, xx), x80)

    def conv(cin, cout, ksize, name, inp):
        m = Conv2d(cout, ksize, padding=ksize // 2)
        v = bf16_params(jax.jit(lambda key: m.init(key, inp))(k))
        timeit(name, lambda xx: m.apply(v, xx), inp)

    conv(7, 128, 3, "conv 3x3 7->128 (conv_shared)", seg)
    conv(128, 80, 3, "conv 3x3 128->80 (gamma|beta)", x128)
    conv(128, 160, 3, "conv 3x3 128->160 (gamma+beta merged)", x128)
    conv(128, 32, 3, "conv 3x3 128->32", x128)
    conv(128, 64, 3, "conv 3x3 128->64", x128)
    conv(80, 32, 3, "conv 3x3 80->32 (conv_0)", x80)
    conv(32, 32, 3, "conv 3x3 32->32 (conv_1)", arr(H, W, 32))
    conv(80, 32, 1, "conv 1x1 80->32 (conv_s)", x80)

    # --- matmul-equivalent of the gamma conv: is it the conv or the shape? --
    w_g = jnp.asarray(_rng.standard_normal((1152, 128)), DTYPE)
    xm = arr(H, W, 128).reshape(B * H * W // 9, 9 * 128)[:, :1152]

    def mm(a):
        return jnp.dot(a, w_g, preferred_element_type=jnp.float32)
    timeit("matmul (BHW/9,1152)x(1152,128) proxy", mm, xm)


if __name__ == "__main__":
    main()
