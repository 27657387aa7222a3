#!/usr/bin/env python
"""Localize the FULL-pipeline glue: 272 ms measured vs 53 (condition) + 165
(generator standalone) = 218 component sum.

Variants, all in one jit with the salted lax.map harness:
  A) condition_forward only                          (expect ~53)
  B) generator only, on independent inputs           (expect ~165)
  C) A and B in the SAME jit, data-independent       (sum? or overhead?)
  D) composed: generator consumes condition outputs  (the real pipeline)
C vs A+B isolates graph-size/scheduling overhead; D vs C isolates the
dataflow interface (layout conversions between stages)."""
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
from hrviton_tpu.pipelines import condition_forward, tryon_forward

B = 4
K = int(os.environ.get("PROF_ITERS", "10"))
FH, FW = 1024, 768
_rng = np.random.default_rng(0)


def arr(h, w, c, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype)


def bench(name, many, *args):
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best / K * 1e3:9.2f} ms/batch", flush=True)


def main():
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    gen = SPADEGenerator(SPADEGenConfig(ngf=64))
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, 256, 192, 4)), jnp.zeros((1, 256, 192, 16)),
        train=False))(k))
    gv = bf16_params(jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, FH, FW, 9)),
        jnp.zeros((1, FH, FW, 7)), train=False))(k))
    nk = jax.random.PRNGKey(1)

    batch = {"cloth": arr(FH, FW, 3), "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13), "densepose": arr(FH, FW, 3),
             "agnostic": arr(FH, FW, 3)}
    gen_in, parse7 = arr(FH, FW, 9), arr(FH, FW, 7)
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    def ta(tv_):
        return lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)

    def ga(gv_):
        return lambda x, s: gen.apply(gv_, x, s, train=False,
                                      rngs={"noise": nk})

    def salted(b, s):
        return jax.tree_util.tree_map(lambda x: x + s.astype(x.dtype), b)

    @jax.jit
    def many_A(tv_, b):
        def one(s):
            c = condition_forward(ta(tv_), salted(b, s), pcfg)
            return (jnp.mean(c.warped_cloth.astype(jnp.float32))
                    + jnp.mean(c.parse7.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_B(gv_, gi, p7):
        def one(s):
            return jnp.mean(ga(gv_)(gi + s.astype(gi.dtype), p7).astype(
                jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_C(tv_, gv_, b, gi, p7):
        def one(s):
            c = condition_forward(ta(tv_), salted(b, s), pcfg)
            out = ga(gv_)(gi + s.astype(gi.dtype), p7)
            return (jnp.mean(c.warped_cloth.astype(jnp.float32))
                    + jnp.mean(c.parse7.astype(jnp.float32))
                    + jnp.mean(out.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_D(tv_, gv_, b):
        def one(s):
            out, _ = tryon_forward(ta(tv_), ga(gv_), salted(b, s), pcfg)
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_D2(tv_, gv_, b):
        def one(s):
            bb = salted(b, s)
            c = condition_forward(ta(tv_), bb, pcfg)
            gi = jnp.concatenate([bb["agnostic"], bb["densepose"],
                                  c.warped_cloth], axis=-1)
            gi, p7 = jax.lax.optimization_barrier((gi, c.parse7))
            out = ga(gv_)(gi, p7)
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_D3(tv_, gv_, b, gi):
        # composed parse7, independent gen_in: isolates which interface
        # tensor carries the cost
        def one(s):
            c = condition_forward(ta(tv_), salted(b, s), pcfg)
            out = ga(gv_)(gi + s.astype(gi.dtype), c.parse7)
            return jnp.mean(out.astype(jnp.float32)) + jnp.mean(
                c.warped_cloth.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    @jax.jit
    def many_D4(tv_, gv_, b, p7):
        # composed gen_in, independent parse7
        def one(s):
            bb = salted(b, s)
            c = condition_forward(ta(tv_), bb, pcfg)
            gi = jnp.concatenate([bb["agnostic"], bb["densepose"],
                                  c.warped_cloth], axis=-1)
            out = ga(gv_)(gi, p7)
            return jnp.mean(out.astype(jnp.float32)) + jnp.mean(
                c.parse7.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    only = os.environ.get("GLUE_ONLY", "")

    def want(tag):
        return (not only) or tag in only.split(",")

    if want("A"):
        bench("A condition only", many_A, tv, batch)
    if want("B"):
        bench("B generator only (indep inputs)", many_B, gv, gen_in, parse7)
    if want("C"):
        bench("C A+B same jit, data-independent", many_C, tv, gv, batch,
              gen_in, parse7)
    if want("D"):
        bench("D composed pipeline (tryon_forward)", many_D, tv, gv, batch)
    if want("D2"):
        bench("D2 composed + optimization_barrier at interface", many_D2,
              tv, gv, batch)
    if want("D3"):
        bench("D3 composed parse7, indep gen_in", many_D3, tv, gv, batch,
              gen_in)
    if want("D4"):
        bench("D4 composed gen_in, indep parse7", many_D4, tv, gv, batch,
              parse7)


if __name__ == "__main__":
    main()
