#!/usr/bin/env python
"""Experiment 2: isolate why full-res convs underperform on v5e.

Hypothesis grid: kernel-area scaling (im2col amplification), channel padding,
layout, dtype, spatial vs channel shape trades at constant FLOPs.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import jax.lax as lax

B = 4
K = int(os.environ.get("PROF_ITERS", "10"))
H, W = 1024, 768
_rng = np.random.default_rng(0)

def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6
    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 2
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:58s} {per * 1e3:9.2f} ms", flush=True)
    return per

def arr(shape, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal(shape), dtype=dtype)

def conv(x, w, pad):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), ((pad, pad), (pad, pad)),
                                    dimension_numbers=dn)

def main():
    x128 = arr((B, H, W, 128))
    timeit("conv 1x1 128->128 @1024x768", lambda x: conv(x, arr((1,1,128,128)), 0), x128)
    timeit("conv 3x3 128->128 @1024x768", lambda x: conv(x, arr((3,3,128,128)), 1), x128)
    timeit("conv 5x5 128->128 @1024x768", lambda x: conv(x, arr((5,5,128,128)), 2), x128)
    timeit("matmul (B*H*W,128)x(128,128)",
           lambda x: jnp.dot(x, arr((128,128)), preferred_element_type=jnp.bfloat16),
           x128.reshape(B*H*W, 128))
    # same FLOPs, channel-heavy: 512x384x256->256
    x256 = arr((B, H//2, W//2, 256))
    timeit("conv 3x3 256->256 @512x384 (same FLOPs)",
           lambda x: conv(x, arr((3,3,256,256)), 1), x256)
    x512 = arr((B, H//4, W//4, 512))
    timeit("conv 3x3 512->512 @256x192 (same FLOPs)",
           lambda x: conv(x, arr((3,3,512,512)), 1), x512)
    # f32 vs bf16 at full res
    timeit("conv 3x3 128->128 @1024x768 f32",
           lambda x: conv(x, arr((3,3,128,128), jnp.float32), 1),
           arr((B, H, W, 128), jnp.float32))
    # is batch dim the issue? fold batch into H
    xb1 = arr((1, B*H, W, 128))
    timeit("conv 3x3 128->128 @(1,4096,768)", lambda x: conv(x, arr((3,3,128,128)), 1), xb1)
    # transposed spatial: W-major 768x1024
    xt = arr((B, W, H, 128))
    timeit("conv 3x3 128->128 @768x1024 (transposed)", lambda x: conv(x, arr((3,3,128,128)), 1), xt)
    # preferred_element_type f32 accum
    def conv_pf(x, w, pad):
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, (1,1), ((pad,pad),(pad,pad)),
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    timeit("conv 3x3 128->128 f32-accum", lambda x: conv_pf(x, arr((3,3,128,128)), 1), x128)
    # 9 shifted matmuls (manual, no pallas): pad then 9 dots accumulated
    w9 = arr((3,3,128,128))
    def shifted(x):
        xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
        acc = jnp.zeros((B, H, W, 128), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(xp[:, dy:dy+H, dx:dx+W, :], w9[dy, dx],
                                    preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)
    timeit("conv 3x3 128->128 as 9 shifted matmuls", shifted, x128)

if __name__ == "__main__":
    main()
