#!/usr/bin/env python
"""Roofline accounting for the inference pipeline (VERDICT r1 item 2).

For each stage (condition_forward, SPADE generator, composed pipeline) this
compiles the salted lax.map harness used by every timing tool and reads XLA's
own cost model (compiled.cost_analysis): logical flops and HBM bytes accessed.
Dividing by the chip ceilings measured by tools/exp_mxu*.py / exp_hbm_bw.py
(sustained bf16 matmul 62-114 TF/s, HBM streaming 400-640 GB/s on this v5e)
gives the physically-required ms per stage, to compare against the measured
ms from tools/exp_glue.py / profile_components.py.

Usage: python tools/exp_roofline.py [cond|gen|full ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import condition_forward, tryon_forward

B = 4
FH, FW = 1024, 768
# measured chip ceilings (tools/exp_mxu2.py, exp_hbm_bw.py, round 2)
MXU_TFS = (62.0, 114.0)
HBM_GBS = (400.0, 640.0)
_rng = np.random.default_rng(0)


def arr(h, w, c, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype)


def report(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = ca.get("flops", 0.0)
    by = ca.get("bytes accessed", 0.0)
    t_mxu = (fl / (MXU_TFS[1] * 1e12) * 1e3, fl / (MXU_TFS[0] * 1e12) * 1e3)
    t_hbm = (by / (HBM_GBS[1] * 1e9) * 1e3, by / (HBM_GBS[0] * 1e9) * 1e3)
    print(f"{name:34s} {fl / 1e9:9.1f} GF  {by / 1e9:7.2f} GB"
          f"   mxu {t_mxu[0]:6.1f}-{t_mxu[1]:6.1f} ms"
          f"   hbm {t_hbm[0]:6.1f}-{t_hbm[1]:6.1f} ms", flush=True)


def main():
    which = sys.argv[1:] or ["cond", "gen", "full"]
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

    def ta(tv_):
        return lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)

    def ga(gv_):
        return lambda x, s: gen.apply(gv_, x, s, train=False,
                                      rngs={"noise": nk})

    if "cond" in which:
        def cond(tv_, b):
            c = condition_forward(ta(tv_), b, pcfg)
            return c.warped_cloth, c.parse7
        report("condition_forward", cond, tv, batch)
    if "gen" in which:
        def g(gv_, gi, p7):
            return ga(gv_)(gi, p7)
        report("SPADE generator", g, gv, gen_in, parse7)
    if "full" in which:
        def full(tv_, gv_, b):
            out, _ = tryon_forward(ta(tv_), ga(gv_), b, pcfg)
            return out
        report("composed pipeline", full, tv, gv, batch)
    print("ceilings: mxu 62-114 TF/s sustained bf16, hbm 400-640 GB/s "
          "(measured, tools/exp_mxu2.py exp_hbm_bw.py)")


if __name__ == "__main__":
    main()
