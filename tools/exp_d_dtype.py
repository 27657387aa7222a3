#!/usr/bin/env python
"""bf16 vs f32: SPADE discriminator fwd+bwd and the frozen conditioning chain."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.config import (PipelineConfig, SPADEDiscriminatorConfig,
                                TOCGConfig)
from hrviton_tpu.models import ConditionGenerator, SPADEMultiscaleDiscriminator
from hrviton_tpu.pipelines import condition_forward

B = int(os.environ.get("PROF_BATCH", "1"))
K = int(os.environ.get("PROF_ITERS", "5"))
H, W = 1024, 768
_rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            return fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                        jnp.issubdtype(x.dtype, jnp.floating) and
                        getattr(x, "ndim", 0) == 4 else x for x in a])
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / K * 1e3:9.2f} ms", flush=True)


def main():
    d = SPADEMultiscaleDiscriminator(SPADEDiscriminatorConfig())
    k = jax.random.PRNGKey(0)
    dv0 = jax.jit(lambda key: d.init(key, jnp.zeros((1, H, W, 10)),
                                     train=True))(k)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        dv = bf16_params(dv0) if dt == jnp.bfloat16 else dv0
        # cat(fake, real) along batch like the trainer does
        x = jnp.asarray(_rng.standard_normal((2 * B, H, W, 10)), dt)

        def d_grad(v, x):
            def f(x_):
                feats = d.apply(v, x_, train=True)
                return sum(jnp.mean(jnp.abs(t[-1]).astype(jnp.float32))
                           for t in feats)
            return jax.grad(f)(x)

        timeit(f"SPADE D fwd+bwd {tag} 2B={2*B}",
               lambda v, a: jnp.mean(d_grad(v, a).astype(jnp.float32)), dv, x)

    # frozen conditioning chain (no-grad): tocg @256x192 + full-res warp+blur
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    tv0 = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, 256, 192, 4)), jnp.zeros((1, 256, 192, 16)),
        train=False))(k)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tv = bf16_params(tv0) if dt == jnp.bfloat16 else tv0
        batch = {
            "cloth": jnp.asarray(_rng.standard_normal((B, H, W, 3)), dt),
            "cloth_mask": jnp.asarray(_rng.uniform(0, 1, (B, H, W, 1)), dt),
            "parse_agnostic": jnp.asarray(
                _rng.standard_normal((B, H, W, 13)), dt),
            "densepose": jnp.asarray(_rng.standard_normal((B, H, W, 3)), dt),
            "agnostic": jnp.asarray(_rng.standard_normal((B, H, W, 3)), dt),
        }

        def cond(tv, batch):
            def apply(i1, i2):
                return tocg.apply(tv, i1, i2, train=False)
            out = condition_forward(apply, batch, pcfg)
            return (jnp.mean(out.warped_cloth.astype(jnp.float32)) +
                    jnp.mean(out.parse7.astype(jnp.float32)) +
                    jnp.mean(out.fake_parse_gauss.astype(jnp.float32)))

        timeit(f"conditioning chain {tag} B={B}", cond, tv, batch)


if __name__ == "__main__":
    main()
