#!/usr/bin/env python
"""A/B: SPADEResBlock (up_4 shape, eval) with Pallas fast-conv on vs off."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models.spade import SPADEResBlock
from hrviton_tpu.ops import fast_conv

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
H, W = 1024, 768
CIN, COUT = 80, 32
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


def main():
    blk = SPADEResBlock(CIN, COUT, norm_g="spectralaliasinstance",
                        gen_semantic_nc=7)
    x = jnp.asarray(_rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    seg = jnp.asarray(_rng.standard_normal((B, H, W, 7)), jnp.bfloat16)
    v = jax.jit(lambda k: blk.init({"params": k, "noise": k},
                                   x[:1], seg[:1], train=False))(
        jax.random.PRNGKey(0))
    v = bf16_params(v)
    nk = jax.random.PRNGKey(1)

    def run(v, x, seg):
        return blk.apply(v, x, seg, train=False, rngs={"noise": nk})

    with fast_conv(False):
        timeit("SPADEResBlock up_4 eval (XLA convs)", run, v, x, seg)
    with fast_conv(True):
        timeit("SPADEResBlock up_4 eval (pallas gamma/beta)", run, v, x, seg)


if __name__ == "__main__":
    main()
