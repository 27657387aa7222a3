#!/usr/bin/env python
"""Scan-chained matmul: y <- (y @ B) * c, K times inside one jit. No per-iter
operand copies, true sequential dependency — isolates sustained MXU rate from
the lax.map+salt harness overhead."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import jax.lax as lax

K = int(os.environ.get("PROF_ITERS", "20"))
_rng = np.random.default_rng(0)

def run(m, k):
    a = jnp.asarray(_rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(_rng.standard_normal((k, k)) * 0.1, jnp.bfloat16)

    @jax.jit
    def many(a, b):
        def body(y, _):
            y2 = (jnp.dot(y, b, preferred_element_type=jnp.float32)
                  * (1.0 / 16.0)).astype(jnp.bfloat16)
            return y2, ()
        y, _ = lax.scan(body, a, None, length=K)
        return jnp.mean(jnp.abs(y).astype(jnp.float32))
    float(many(a, b))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(many(a, b))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    fl = 2 * m * k * k
    print(f"chained matmul ({m}x{k})x({k}x{k}): {per*1e3:8.3f} ms "
          f"{fl/per/1e12:7.1f} TF/s", flush=True)

for m, k in [(4096, 4096), (16384, 4096), (786432, 128), (786432, 512)]:
    run(m, k)
