#!/usr/bin/env python
"""Isolate why the bf16 stage-2 train step is SLOWER than f32 on v5e.

Times (value+grad) of the VGG perceptual loss and a SPADE generator fwd+bwd
at production size in both dtypes.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.losses.perceptual import make_vgg_loss, vgg_perceptual_loss
from hrviton_tpu.config import SPADEGenConfig
from hrviton_tpu.models import SPADEGenerator

B = int(os.environ.get("PROF_BATCH", "1"))
K = int(os.environ.get("PROF_ITERS", "5"))
H, W = 1024, 768
_rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and
                       getattr(x, "ndim", 0) == 4 else x for x in a])
            return out
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / K * 1e3:9.2f} ms", flush=True)


def main():
    if int(os.environ.get("SKIP_VGG", "0")):
        vgg = None
    else:
        vgg = make_vgg_loss(image_hw=(H, W))
    for dt, tag in (() if vgg is None else
                    ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"))):
        vv = bf16_params(vgg.variables) if dt == jnp.bfloat16 else vgg.variables
        fake = jnp.asarray(_rng.standard_normal((B, H, W, 3)), dt)
        real = jnp.asarray(_rng.standard_normal((B, H, W, 3)), dt)

        def loss_grad(fake, real):
            return jax.grad(lambda f: vgg_perceptual_loss(vv, f, real))(fake)

        timeit(f"VGG percep loss grad {tag} B={B}",
               lambda f, r: jnp.mean(loss_grad(f, r).astype(jnp.float32)),
               fake, real)

    gen = SPADEGenerator(SPADEGenConfig(ngf=64))
    k = jax.random.PRNGKey(0)
    gv0 = jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, H, W, 9)),
        jnp.zeros((1, H, W, 7)), train=False))(k)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        gv = bf16_params(gv0) if dt == jnp.bfloat16 else gv0
        x = jnp.asarray(_rng.standard_normal((B, H, W, 9)), dt)
        seg = jnp.asarray(_rng.standard_normal((B, H, W, 7)), dt)

        # weights as jit ARGUMENTS (tunnel rejects >100MB HLO constants)
        def gen_grad(v, x, seg):
            def f(x_):
                out = gen.apply(v, x_, seg, train=True, update_sn=False,
                                rngs={"noise": jax.random.PRNGKey(1)})
                if isinstance(out, tuple):
                    out = out[0]
                return jnp.mean(out.astype(jnp.float32))
            return jax.grad(f)(x)

        timeit(f"SPADE gen fwd+bwd {tag} B={B}",
               lambda v, a, b: jnp.mean(gen_grad(v, a, b).astype(jnp.float32)),
               gv, x, seg)


if __name__ == "__main__":
    main()
