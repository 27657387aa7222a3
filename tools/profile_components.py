#!/usr/bin/env python
"""Per-component timing of the try-on pipeline on the real chip.

Times each stage as its own jitted program (weights as arguments):
  tocg @256x192, segmap 13ch resize 256->1024, gaussian blur @1024x768x13,
  argmax+regroup, full-res grid_sample warp, SPADE generator @1024x768,
plus the fused end-to-end pipeline, so optimization effort (Pallas kernels,
layout changes) goes where the time is.

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
from hrviton_tpu.ops import gaussian_blur, grid_sample, interpolate, make_grid
from hrviton_tpu.ops.parse import onehot, parse13_to_7
from hrviton_tpu.pipelines import tryon_forward

B = int(os.environ.get("PROF_BATCH", "4"))
FH, FW = 1024, 768
CH, CW = 256, 192
DTYPE = jnp.bfloat16


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.2f} ms/batch  {dt * 1e3 / B:8.2f} ms/img",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
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

    def arr(h, w, c):
        return jnp.asarray(rng.standard_normal((B, h, w, c)), dtype=DTYPE)

    in1 = arr(CH, CW, 4)
    in2 = arr(CH, CW, 16)
    seg13 = arr(CH, CW, 13)
    seg13_full = arr(FH, FW, 13)
    cloth = arr(FH, FW, 3)
    flow = jnp.asarray(rng.standard_normal((B, CH // 2, CW // 2, 2)) * 3,
                       dtype=jnp.float32)
    gen_in = arr(FH, FW, 9)
    parse7 = arr(FH, FW, 7)
    noise_key = jax.random.PRNGKey(1)

    timeit("tocg fwd @256x192",
           jax.jit(lambda v, a, b: tocg.apply(v, a, b, train=False)[1]),
           tv, in1, in2)
    timeit("segmap bilinear 256->1024 (13ch)",
           jax.jit(lambda s: interpolate(s, (FH, FW), "bilinear")), seg13)
    timeit("gaussian blur 15x15 @1024x768x13",
           jax.jit(lambda s: gaussian_blur(s, (15, 15), (3.0, 3.0))),
           seg13_full)
    timeit("argmax + 13->7 regroup @1024",
           jax.jit(lambda s: parse13_to_7(
               onehot(jnp.argmax(s, -1).astype(jnp.int32), 13))), seg13_full)

    @jax.jit
    def warp_full(c, f):
        ff = interpolate(f, (FH, FW), "bilinear")
        fn = jnp.stack([ff[..., 0] / pcfg.flow_norm_w,
                        ff[..., 1] / pcfg.flow_norm_h], -1)
        return grid_sample(c, fn + make_grid(B, FH, FW))

    timeit("flow resize + grid_sample warp @1024 (3ch)", warp_full, cloth, flow)
    timeit("SPADE generator @1024x768",
           jax.jit(lambda v, x, s: gen.apply(v, x, s, train=False,
                                             rngs={"noise": noise_key})),
           gv, gen_in, parse7)

    batch = {"cloth": cloth,
             "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13),
             "densepose": arr(FH, FW, 3),
             "agnostic": arr(FH, FW, 3)}

    @jax.jit
    def full(tv_, gv_, b):
        def ta(i1, i2):
            return tocg.apply(tv_, i1, i2, train=False)

        def ga(x, s):
            return gen.apply(gv_, x, s, train=False, rngs={"noise": noise_key})

        return tryon_forward(ta, ga, b, pcfg)[0]

    timeit("FULL pipeline @1024x768", full, tv, gv, batch)


if __name__ == "__main__":
    main()
