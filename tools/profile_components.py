#!/usr/bin/env python
"""Per-component timing of the try-on pipeline on the real chip.

Methodology (important on this backend): the device tunnel has ~35ms fixed
per-call latency and block_until_ready does not reliably synchronize, so each
component is timed as K invocations *inside one jit* (lax.map over stacked
inputs) with a scalar checksum readback; the fixed overhead amortizes away.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/profile_components.py
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
from hrviton_tpu.models.spade import SPADEResBlock
from hrviton_tpu.ops import gaussian_blur, grid_sample, interpolate, make_grid
from hrviton_tpu.ops.parse import onehot, parse13_to_7
from hrviton_tpu.pipelines import condition_forward, tryon_forward

B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
FH, FW = 1024, 768
CH, CW = 256, 192
DTYPE = jnp.bfloat16
_rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    """fn(*args) -> array; times K in-jit invocations with varying dummy salt."""
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim == 4
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    float(many(*args))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:46s} {per * 1e3:9.2f} ms/batch  {per * 1e3 / B:8.2f} ms/img",
          flush=True)
    return per


def arr(h, w, c, dtype=DTYPE):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype=dtype)


def main():
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    gen_cfg = SPADEGenConfig(ngf=64)
    gen = SPADEGenerator(gen_cfg)
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k))
    gv = bf16_params(jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, FH, FW, 9)),
        jnp.zeros((1, FH, FW, 7)), train=False))(k))
    noise_key = jax.random.PRNGKey(1)

    in1, in2 = arr(CH, CW, 4), arr(CH, CW, 16)
    seg13_full = arr(FH, FW, 13)
    cloth4 = arr(FH, FW, 4)
    gen_in, parse7 = arr(FH, FW, 9), arr(FH, FW, 7)

    timeit("tocg fwd @256x192",
           lambda a, b: tocg.apply(tv, a, b, train=False)[1], in1, in2)
    timeit("blur+argmax+regroup+seg-resize @1024",
           lambda s: parse13_to_7(onehot(jnp.argmax(
               gaussian_blur(interpolate(s, (FH, FW), "bilinear")[..., :13],
                             (15, 15), (3.0, 3.0)), -1).astype(jnp.int32), 13)),
           arr(CH, CW, 13))
    flow = jnp.asarray(_rng.standard_normal((B, CH // 2, CW // 2, 2)) * 3,
                       dtype=jnp.float32)

    def warp_full(c, f):
        ff = interpolate(f, (FH, FW), "bilinear")
        fn = jnp.stack([ff[..., 0] / pcfg.flow_norm_w,
                        ff[..., 1] / pcfg.flow_norm_h], -1)
        return grid_sample(c, fn + make_grid(B, FH, FW))

    timeit("flow resize + grid_sample warp @1024 (4ch)", warp_full, cloth4, flow)
    timeit("SPADE generator @1024x768",
           lambda x, s: gen.apply(gv, x, s, train=False,
                                  rngs={"noise": noise_key}), gen_in, parse7)

    # --- per-block SPADE breakdown (standalone blocks, random weights) -------
    def block_time(name, in_nc, out_nc, h, w):
        blk = SPADEResBlock(in_nc, out_nc, norm_g=gen_cfg.norm_g,
                            gen_semantic_nc=7)
        x = arr(h, w, in_nc)
        seg = arr(h, w, 7)
        bv = bf16_params(jax.jit(lambda key: blk.init(
            {"params": key, "noise": key}, x, seg, train=False))(k))
        timeit(f"SPADEResBlock {in_nc}->{out_nc} @{h}x{w}",
               lambda xx, ss: blk.apply(bv, xx, ss, train=False,
                                        rngs={"noise": noise_key}), x, seg)

    block_time("up_4", 64 + 16, 32, 1024, 768)
    block_time("up_3", 128 + 16, 64, 512, 384)
    block_time("up_2", 256 + 16, 128, 256, 192)
    block_time("up_1", 512 + 16, 256, 128, 96)
    block_time("head+mid(sum proxy)", 1024 + 16, 1024, 32, 24)

    batch = {"cloth": arr(FH, FW, 3), "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13), "densepose": arr(FH, FW, 3),
             "agnostic": arr(FH, FW, 3)}

    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    # weights must be jit ARGUMENTS (tunnel rejects >~100MB HLO constants)
    @jax.jit
    def full_many(tv_, gv_, b):
        def ta(i1, i2):
            return tocg.apply(tv_, i1, i2, train=False)

        def ga(x, s):
            return gen.apply(gv_, x, s, train=False,
                             rngs={"noise": noise_key})

        def one(s):
            bb = jax.tree_util.tree_map(lambda x: x + s.astype(x.dtype), b)
            return jnp.mean(tryon_forward(ta, ga, bb, pcfg)[0].astype(
                jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    float(full_many(tv, gv, batch))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(full_many(tv, gv, batch))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{'FULL pipeline @1024x768':46s} {per * 1e3:9.2f} ms/batch  "
          f"{per * 1e3 / B:8.2f} ms/img", flush=True)

    # condition stage alone (everything except the SPADE generator): the
    # difference FULL - (this) - (SPADE generator) is cross-stage glue.
    @jax.jit
    def cond_many(tv_, b):
        def ta(i1, i2):
            return tocg.apply(tv_, i1, i2, train=False)

        def one(s):
            bb = jax.tree_util.tree_map(lambda x: x + s.astype(x.dtype), b)
            c = condition_forward(ta, bb, pcfg)
            return (jnp.mean(c.warped_cloth.astype(jnp.float32))
                    + jnp.mean(c.parse7.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, salts))

    float(cond_many(tv, batch))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(cond_many(tv, batch))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{'condition stage (tocg+blur+warp+glue)':46s} {per * 1e3:9.2f} "
          f"ms/batch  {per * 1e3 / B:8.2f} ms/img", flush=True)


if __name__ == "__main__":
    main()
