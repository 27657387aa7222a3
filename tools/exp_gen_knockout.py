#!/usr/bin/env python
"""Composed knockout attribution of the generator stage at current HEAD.

The r4 attribution (tools/profile_components.py: generator 155.3 ms/b4)
predates the fused-unit default and the kx-lane-merged producer; the ~24 ms
VERDICT-r4 target (>= 24 img/s) needs a FRESH budget of the ~130 ms
generator before any new kernel is written. Same methodology as
exp_cond_knockout.py — time the FULL composed pipeline, then with ONE piece
statically stubbed (models/spade.py:gen_knock, timing-only), attribute the
diff. Composed-graph timings only (ROADMAP §4 hygiene rule).

Knocks:
  conv_shared  per-norm 7->128 seg conv -> tied const   (XLA, ~6 full-res)
  seg_for      per-scale seg one-hot -> tied const
  stats        per-unit fused XLA stats pass -> consts
  unit         fused Pallas kernels -> channel-slice stub (all of them)
  features     8-scale input pyramid -> tied consts
  conv_img     final full-res conv -> slice
  noise        (in-kernel tag set is forwarded; unknown tags no-op)

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
       python tools/exp_gen_knockout.py [knock ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.models.spade import gen_knock
from hrviton_tpu.pipelines import tryon_forward

B, K = 4, 10
FH, FW, CH, CW = 1024, 768, 256, 192
_rng = np.random.default_rng(0)

KNOCKS = ("conv_shared", "seg_for", "stats", "unit", "features", "pyramid",
          "conv_img")


def arr(h, w, c, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            sa = jax.tree_util.tree_map(
                lambda x: x + s.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
                else x, a)
            out = fn(*sa)
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


def main():
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    gen = SPADEGenerator(SPADEGenConfig(ngf=64))
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k))
    gv = bf16_params(jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, FH, FW, 9)),
        jnp.zeros((1, FH, FW, 7)), train=False))(k))
    nk = jax.random.PRNGKey(1)
    batch = {"cloth": arr(FH, FW, 3), "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13), "densepose": arr(FH, FW, 3),
             "agnostic": arr(FH, FW, 3)}

    def full(tv_, gv_, bt, knocks=()):
        ta = lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)

        def ga(x, s):
            with gen_knock(knocks):
                return gen.apply(gv_, x, s, train=False, rngs={"noise": nk})
        out, _ = tryon_forward(ta, ga, bt, pcfg)
        return out

    which = sys.argv[1:] or ["full"] + list(KNOCKS) + ["skeleton"]
    t_full = None
    for name in which:
        knocks = (() if name == "full" else
                  KNOCKS if name == "skeleton" else (name,))
        t = timeit(f"composed {name}",
                   lambda a, b, c, kn=knocks: full(a, b, c, kn), tv, gv, batch)
        if name == "full":
            t_full = t
        elif t_full is not None:
            print(f"  -> attributed: {1e3 * (t_full - t):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
