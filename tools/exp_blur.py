#!/usr/bin/env python
"""A/B: depthwise-conv Gaussian blur vs banded-matmul blur at pipeline shape."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import jax.lax as lax

from hrviton_tpu.ops.blur import gaussian_blur, gaussian_kernel1d

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
H, W, C = 1024, 768, 13
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
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / K * 1e3:9.2f} ms", flush=True)


def blur_depthwise(x, ksize=(15, 15), sigma=(3.0, 3.0)):
    n, h, w, c = x.shape
    kh, kw = ksize
    dtype = x.dtype
    y = x.astype(jnp.float32)
    dn = lax.conv_dimension_numbers((n, h, w, c), (kh, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    k_h = jnp.asarray(gaussian_kernel1d(kh, float(sigma[1])))
    k_w = jnp.asarray(gaussian_kernel1d(kw, float(sigma[0])))
    kern_h = jnp.broadcast_to(k_h[:, None, None, None], (kh, 1, 1, c))
    kern_w = jnp.broadcast_to(k_w[None, :, None, None], (1, kw, 1, c))
    y = lax.conv_general_dilated(y, kern_h, (1, 1), ((kh // 2, kh // 2), (0, 0)),
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    y = lax.conv_general_dilated(y, kern_w, (1, 1), ((0, 0), (kw // 2, kw // 2)),
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return y.astype(dtype)


def main():
    for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        x = jnp.asarray(_rng.standard_normal((B, H, W, C)), dt)
        r_old = np.asarray(jax.jit(blur_depthwise)(x), np.float32)
        r_new = np.asarray(jax.jit(gaussian_blur)(x), np.float32)
        d = np.abs(r_old - r_new).max()
        print(f"[{tag}] max|old-new| {d:.6f}")
        timeit(f"blur depthwise {tag}", blur_depthwise, x)
        timeit(f"blur banded-matmul {tag}", gaussian_blur, x)


if __name__ == "__main__":
    main()
