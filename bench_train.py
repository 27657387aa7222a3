#!/usr/bin/env python
"""Training-step benchmark: certifies the framework's training throughput the
way bench.py certifies inference (VERDICT r3 item #3).

Measures, on one real TPU chip, with scan-chained steps inside a single jit
(tunnel-latency-proof — see tools/bench_train.py / ROADMAP §6 methodology):
  * stage-2 (SPADE generator+D, frozen tocg) at 1024x768, batch 2/chip, bf16,
    taps_wgrad — the production configuration; reference baseline: ~96 h for
    the same 100k+100k-step schedule at global batch 4 fp16 on 2x RTX 3090
    (/root/reference/README.md:71-73);
  * stage-1 (condition generator) at 256x192, batch 8, f32 — the reference's
    default stage-1 configuration (300k steps, train_condition.py:51,68).

Prints ONE JSON line. Run:
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python bench_train.py
Output is committed as BENCH_TRAIN_r{N}.json each round.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hrviton_tpu.config import (CondDiscriminatorConfig, ConditionTrainConfig,
                                GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.losses.perceptual import make_vgg_loss
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.train import ConditionTrainer, GeneratorTrainer

STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", "4"))
B2 = int(os.environ.get("BENCH_TRAIN_B2", "2"))      # stage-2 batch/chip
B1 = int(os.environ.get("BENCH_TRAIN_B1", "8"))      # stage-1 batch/chip
REF_STAGE2_HOURS = 96.0   # ~4 days, 200k steps b4 fp16, 2x3090 (README.md:71-73)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed_scan(step_fn, state, batch, frozen):
    """Chain STEPS state-dependent train steps inside one jit; time the
    second invocation (first compiles+warms) via scalar loss readback."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(state, batch, rngk, frozen):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st2, m = step_fn(st, batch, sub, frozen)
            return (st2, key), next(iter(m.values()))
        (state, _), losses = lax.scan(body, (state, jax.random.PRNGKey(2)),
                                      None, length=STEPS)
        return state, losses

    state2, losses = steps(state, batch, None, frozen)
    float(losses[-1])
    t0 = time.perf_counter()
    _, losses = steps(state2, batch, None, frozen)
    assert float(losses[-1]) == float(losses[-1]), "NaN loss"
    return (time.perf_counter() - t0) / STEPS


def stage2():
    FH, FW, CH, CW = 1024, 768, 256, 192
    rng = np.random.default_rng(0)
    tocg_cfg = TOCGConfig(ngf=96)
    tocg = ConditionGenerator(tocg_cfg)
    tv = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(jax.random.PRNGKey(0))
    vgg = make_vgg_loss(image_hw=(256, 192))

    def arr(c):
        return jnp.asarray(rng.standard_normal((B2, FH, FW, c)), jnp.float32)

    labels = rng.integers(0, 13, (B2, FH, FW)).astype(np.int32)
    batch = {"cloth": arr(3),
             "cloth_mask": jnp.asarray(rng.uniform(0, 1, (B2, FH, FW, 1)),
                                       jnp.float32),
             "parse_agnostic": arr(13), "densepose": arr(3),
             "agnostic": arr(3), "image": arr(3),
             "parse": jnp.asarray(labels[..., None] == np.arange(13),
                                  jnp.float32),
             "parse_cloth": arr(3)}
    # bf16 buffers: f32 argument buffers would stay live in HBM all step
    frozen = bf16_params({"vgg": vgg.variables, "tocg": tv})
    batch = bf16_params(batch)

    tcfg = GeneratorTrainConfig(batch_size=B2, bf16=True, taps_wgrad=True)
    tr = GeneratorTrainer(SPADEGenConfig(ngf=64),
                          SPADEDiscriminatorConfig(), tcfg,
                          PipelineConfig(), tocg_cfg)
    state = tr.init(jax.random.PRNGKey(1))
    log(f"stage2: compiling+running {STEPS}-step scan at b{B2} bf16 ...")
    dt = timed_scan(tr.train_step, state, batch, frozen)
    log(f"stage2: {dt * 1e3:.0f} ms/step")
    return dt


def stage1():
    CH, CW = 256, 192
    rng = np.random.default_rng(0)
    vgg = make_vgg_loss(image_hw=(CH, CW))

    def arr(c):
        return jnp.asarray(rng.standard_normal((B1, CH, CW, c)), jnp.float32)

    labels = rng.integers(0, 13, (B1, CH, CW)).astype(np.int32)
    batch = {
        "cloth": {"paired": arr(3)},
        "cloth_mask": {"paired": jnp.asarray(
            rng.uniform(0, 1, (B1, CH, CW, 1)), jnp.float32)},
        "parse_agnostic": arr(13), "densepose": arr(3),
        "parse_onehot": jnp.asarray(labels, jnp.int32),
        "parse": jnp.asarray(labels[..., None] == np.arange(13), jnp.float32),
        "pcm": jnp.asarray(rng.uniform(0, 1, (B1, CH, CW, 1)), jnp.float32),
        "parse_cloth": arr(3),
    }
    tcfg = ConditionTrainConfig(batch_size=B1, bf16=False,
                                interflowloss=True, occlusion=True)
    tr = ConditionTrainer(TOCGConfig(ngf=96),
                          CondDiscriminatorConfig(input_nc=4 + 16 + 13), tcfg)
    state = tr.init(jax.random.PRNGKey(1), cond_hw=(CH, CW))
    log(f"stage1: compiling+running {STEPS}-step scan at b{B1} f32 ...")
    dt = timed_scan(tr.train_step, state, batch, vgg.variables)
    log(f"stage1: {dt * 1e3:.0f} ms/step")
    return dt


def main():
    dt2 = stage2()
    dt1 = stage1()
    ours_hours_200k = dt2 * 200000 / 3600
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(dt2 * 1e3, 1),
        "unit": "ms/step (stage2 1024x768)",
        "vs_baseline": round(REF_STAGE2_HOURS / ours_hours_200k, 3),
        "stage2": {"ms_per_step": round(dt2 * 1e3, 1),
                   "batch_per_chip": B2, "bf16": True, "taps_wgrad": True,
                   "imgs_per_sec_per_chip": round(B2 / dt2, 3),
                   "hours_200k_steps_one_chip": round(ours_hours_200k, 1),
                   "baseline": "96h for 200k steps, global batch 4 fp16, "
                               "2x RTX 3090 (reference README.md:71-73)"},
        "stage1": {"ms_per_step": round(dt1 * 1e3, 1),
                   "batch_per_chip": B1, "bf16": False,
                   "imgs_per_sec_per_chip": round(B1 / dt1, 3),
                   "hours_300k_steps_one_chip": round(dt1 * 300000 / 3600, 1)},
    }))


if __name__ == "__main__":
    main()
