#!/usr/bin/env python
"""Profile the UNattributed generator-tail pieces: conv_img (32->3 full-res),
the nearest x2 upsamples, the skip concats, and the 9->16 feature heads.

profile_components.py attributes up_4 86.5 + up_3 36 + up_2 16 + up_1 8 of
the ~165 ms generator; this measures the remainder to see if any of it is
worth a kernel (VERDICT r3 #1 follow-up after the fused-block unit measured
slower composed).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_tail_misc.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hrviton_tpu.ops.resize import interpolate

B = int(os.environ.get("EXP_BATCH", "4"))
K = int(os.environ.get("EXP_ITERS", "10"))
DTYPE = jnp.bfloat16
_rng = np.random.default_rng(0)


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


def conv(x, k, b=None, pad=1, pre_act=None):
    if pre_act == "leaky0.2":
        x = jax.nn.leaky_relu(x, 0.2)
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, k.astype(x.dtype), (1, 1),
                                 ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn)
    return y if b is None else y + b.astype(y.dtype)


def main():
    h32 = arr(B, 1024, 768, 32)
    h64 = arr(B, 512, 384, 64)
    x9 = arr(B, 1024, 768, 9)
    f16 = arr(B, 1024, 768, 16)
    k_img = arr(3, 3, 32, 3, dtype=jnp.float32) * 0.05
    b_img = arr(3, dtype=jnp.float32) * 0.05
    k_head = arr(3, 3, 9, 16, dtype=jnp.float32) * 0.05
    b_head = arr(16, dtype=jnp.float32) * 0.05

    timeit("conv_img 32->3 @1024 (leaky+conv+tanh)",
           lambda a: jnp.tanh(conv(a, k_img, b_img, pre_act="leaky0.2")),
           h32)
    timeit("up() nearest x2 512->1024 (64ch)",
           lambda a: interpolate(a, scale_factor=2, mode="nearest"), h64)
    timeit("concat 64+16 @1024",
           lambda a, b: jnp.concatenate([a, jnp.concatenate(
               [b[..., :8], b[..., 8:]], -1)], axis=-1),
           arr(B, 1024, 768, 64), f16)
    timeit("feature head conv_7 9->16 @1024",
           lambda a: conv(a, k_head, b_head), x9)
    timeit("input pyramid resize x->512 (nearest)",
           lambda a: interpolate(a, size=(512, 384), mode="nearest"), x9)


if __name__ == "__main__":
    main()
