#!/usr/bin/env python
"""Stage-2 training-step throughput at production size (1024x768, batch 4),
f32 vs bf16 — quantifies the replacement of the reference's '~4 days on
2x RTX 3090' baseline (README.md:71-73). Steps are state-dependent (chained),
so timings are hoisting-proof."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.losses.perceptual import make_vgg_loss
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.train import GeneratorTrainer

B = int(os.environ.get("TB_BATCH", "4"))
FH, FW, CH, CW = 1024, 768, 256, 192
N = int(os.environ.get("TB_STEPS", "4"))


def main_stage1():
    """Stage-1 (condition) training-step throughput at 256x192, batch 8."""
    from hrviton_tpu.config import (CondDiscriminatorConfig,
                                    ConditionTrainConfig)
    from hrviton_tpu.train import ConditionTrainer
    rng = np.random.default_rng(0)
    B1 = int(os.environ.get("TB_BATCH", "8"))
    CH2, CW2 = 256, 192
    vgg = make_vgg_loss(image_hw=(CH2, CW2))

    def arr(c, h=CH2, w=CW2):
        return jnp.asarray(rng.standard_normal((B1, h, w, c)), jnp.float32)

    labels = rng.integers(0, 13, (B1, CH2, CW2)).astype(np.int32)
    batch = {
        "cloth": {"paired": arr(3)},
        "cloth_mask": {"paired": jnp.asarray(
            rng.uniform(0, 1, (B1, CH2, CW2, 1)), jnp.float32)},
        "parse_agnostic": arr(13), "densepose": arr(3),
        "parse_onehot": jnp.asarray(labels, jnp.int32),
        "parse": jnp.asarray(labels[..., None] == np.arange(13), jnp.float32),
        "pcm": jnp.asarray(rng.uniform(0, 1, (B1, CH2, CW2, 1)), jnp.float32),
        "parse_cloth": arr(3),
    }
    tocg_cfg = TOCGConfig(ngf=96)
    d_cfg = CondDiscriminatorConfig(input_nc=4 + 16 + 13)
    modes = os.environ.get("TB_MODES", "f32")
    for bf16 in [m == "bf16" for m in modes.split(",")]:
        tcfg = ConditionTrainConfig(batch_size=B1, bf16=bf16,
                                    interflowloss=True, occlusion=True)
        tr = ConditionTrainer(tocg_cfg, d_cfg, tcfg)
        state = tr.init(jax.random.PRNGKey(1), cond_hw=(CH2, CW2))
        rngk = jax.random.PRNGKey(2)

        import functools as _ft

        @_ft.partial(jax.jit, donate_argnums=(0,))
        def steps(state, batch, rngk, vgg_vars):
            import jax.lax as lax

            def body(carry, _):
                st, key = carry
                key, sub = jax.random.split(key)
                st2, m = tr.train_step(st, batch, sub, vgg_vars)
                return (st2, key), m["loss/G"] if "loss/G" in m else 0.0
            (state, _), losses = lax.scan(body, (state, rngk), None, length=N)
            return state, losses

        # checksum readback, NOT block_until_ready (unreliable over the
        # tunnel — see tools/profile_components.py)
        state2, losses = steps(state, batch, rngk, vgg.variables)
        float(losses[-1])
        t0 = time.perf_counter()
        state3, losses = steps(state2, batch, rngk, vgg.variables)
        float(losses[-1])
        dt = (time.perf_counter() - t0) / N
        print(f"stage1 train_step bf16={bf16}: {dt * 1e3:.0f} ms/step "
              f"({B1 / dt:.2f} img/s) -> 300k steps = "
              f"{dt * 300000 / 3600:.1f} h on ONE v5e chip", flush=True)


def main():
    rng = np.random.default_rng(0)
    pcfg = PipelineConfig()
    tocg_cfg = TOCGConfig(ngf=96)
    tocg = ConditionGenerator(tocg_cfg)
    k = jax.random.PRNGKey(0)
    tv = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k)
    vgg = make_vgg_loss(image_hw=(256, 192))

    def arr(c):
        return jnp.asarray(rng.standard_normal((B, FH, FW, c)),
                           dtype=jnp.float32)

    labels = rng.integers(0, 13, (B, FH, FW)).astype(np.int32)
    parse = jnp.asarray(labels[..., None] == np.arange(13), dtype=jnp.float32)
    batch = {"cloth": arr(3),
             "cloth_mask": jnp.asarray(rng.uniform(0, 1, (B, FH, FW, 1)),
                                       dtype=jnp.float32),
             "parse_agnostic": arr(13), "densepose": arr(3), "agnostic": arr(3),
             "image": arr(3), "parse": parse, "parse_cloth": arr(3)}
    frozen = {"vgg": vgg.variables, "tocg": tv}

    modes = os.environ.get("TB_MODES", "bf16,f32")
    for bf16 in [m == "bf16" for m in modes.split(",")]:
        from hrviton_tpu.core.precision import bf16_params
        if bf16:
            # pass frozen weights + batch as bf16 BUFFERS: the trainer casts
            # in-jit anyway, but f32 argument buffers stay live in HBM for the
            # whole step (~0.5G: VGG 574M->287M, tocg, inputs)
            frozen_run = bf16_params(frozen)
            batch_run = bf16_params(batch)
        else:
            frozen_run, batch_run = frozen, batch
        tcfg = GeneratorTrainConfig(
            batch_size=B, bf16=bf16,
            split_d_batch=bool(int(os.environ.get("TB_SPLIT_D", "0"))),
            taps_wgrad=bool(int(os.environ.get("TB_TAPS", "1"))),
            d_remat=bool(int(os.environ.get("TB_D_REMAT", "1"))),
            # attribution bisect knobs (composed-graph variants are the only
            # honest way to attribute step time — ROADMAP §4)
            no_vgg_loss=bool(int(os.environ.get("TB_NO_VGG", "0"))),
            no_gan_feat_loss=bool(int(os.environ.get("TB_NO_FM", "0"))),
            gt_mode=bool(int(os.environ.get("TB_GT", "0"))))
        gcfg = SPADEGenConfig(
            ngf=64, remat=bool(int(os.environ.get("TB_REMAT", "1"))),
            s2d_tail=bool(int(os.environ.get("TB_S2D", "0"))),
            # training default OFF (the unit VJP re-runs an isolated XLA
            # forward per unit: +50 ms/step measured r5; matches
            # cli/train_generator.py's default)
            fused_block=bool(int(os.environ.get("TB_FUSED", "0"))))
        tr = GeneratorTrainer(gcfg, SPADEDiscriminatorConfig(), tcfg, pcfg,
                              tocg_cfg)
        state = tr.init(jax.random.PRNGKey(1))
        rngk = jax.random.PRNGKey(2)
        if int(os.environ.get("TB_SCAN", "0")):
            # chain N steps inside ONE jit (lax.scan) — removes the tunnel's
            # per-dispatch latency from the measurement
            import jax.lax as lax

            import functools as _ft

            @_ft.partial(jax.jit, donate_argnums=(0,))
            def steps(state, batch, rngk, frozen):
                def body(carry, _):
                    st, key = carry
                    key, sub = jax.random.split(key)
                    st2, m = tr.train_step(st, batch, sub, frozen)
                    return (st2, key), m["loss/gen"]
                (state, _), losses = lax.scan(body, (state, rngk), None,
                                              length=N)
                return state, losses
            state2, losses = steps(state, batch_run, rngk, frozen_run)  # compile
            float(losses[-1])
            t0 = time.perf_counter()
            state3, losses = steps(state2, batch_run, rngk, frozen_run)
            float(losses[-1])
            dt = (time.perf_counter() - t0) / N
        else:
            state, m = tr.train_step(state, batch_run, rngk, frozen_run)  # compile
            float(m["loss/gen"])
            t0 = time.perf_counter()
            for _ in range(N):
                rngk, sub = jax.random.split(rngk)
                state, m = tr.train_step(state, batch_run, sub, frozen_run)
            float(m["loss/gen"])
            dt = (time.perf_counter() - t0) / N
        print(f"stage2 train_step bf16={bf16}: {dt * 1e3:.0f} ms/step "
              f"({B / dt:.2f} img/s) -> 200k steps = "
              f"{dt * 200000 / 3600:.1f} h on ONE v5e chip", flush=True)
        if int(os.environ.get("TB_JSON", "0")):
            import json
            # reference baseline: ~4 days for 100k+100k steps, batch 4, fp16,
            # 2x RTX 3090 (/root/reference/README.md:71-73) -> 96 h wall
            ref_hours = 96.0
            ours_hours = dt * 200000 / 3600
            print(json.dumps({
                "metric": "stage2_train_step_1024x768",
                "value": round(dt * 1e3, 1), "unit": "ms/step",
                "batch_per_chip": B, "bf16": bf16,
                "imgs_per_sec_per_chip": round(B / dt, 3),
                "hours_200k_steps_one_chip": round(ours_hours, 1),
                "vs_baseline": round(ref_hours / ours_hours, 3),
                "baseline": "96h for 200k steps b4 fp16 on 2x RTX 3090 "
                            "(reference README.md:71-73)",
            }), flush=True)


if __name__ == "__main__":
    if os.environ.get("TB_STAGE", "2") == "1":
        main_stage1()
    else:
        main()
