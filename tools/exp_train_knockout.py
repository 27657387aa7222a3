#!/usr/bin/env python
"""Composed knockout attribution of the stage-2 training step (ROADMAP §4).

r4 state: 669.5 ms/step at b2 bf16 taps_wgrad, but component sums reach only
~280 ms — ~240 ms of the step graph has never been attributed. Same
methodology as exp_cond_knockout.py: time the FULL composed step, then the
step with ONE piece statically replaced by a shape-preserving stub, and
attribute the diff. Steps are scan-chained over the (donated) train state —
state-dependence makes the timing hoisting-proof without salting.

Knockouts (each is its own compiled graph):
  no_cond      GT-style conditioning stub          -> frozen tocg+warp chain
  no_vgg       drop the VGG loss term              -> VGG fwd+bwd
  no_fm        drop the feature-matching term      -> FM (expected ~0)
  no_d_in_g    G loss = mean(output) only          -> D fwd + D-path G bwd
  reuse_ng     reuse G-step output for the D step  -> one full G forward
  no_d_update  skip the whole D update             -> D fwd+bwd+opt (x2 inputs)
  no_g_bwd     zero G grads (loss fwd only)        -> G backward (+remat)
  no_opt       zero-scale (grads-consuming) update -> Adam transform cost
  skeleton     all of the above                    -> G forward + glue floor

Timing-only semantics changes are fine (this never trains); every stub keeps
the output shapes and state threading identical.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
       TK_BATCH=2 python tools/exp_train_knockout.py [knock ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.core.precision import bf16_params, cast_floating
from hrviton_tpu.losses.gan import gan_loss
from hrviton_tpu.losses.matching import feature_matching_loss
from hrviton_tpu.losses.perceptual import make_vgg_loss, vgg_perceptual_loss
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.train import GeneratorTrainer
from hrviton_tpu.train.state import GANState, NetState

B = int(os.environ.get("TK_BATCH", "2"))
N = int(os.environ.get("TK_STEPS", "4"))
# TK_SMALL=1: tiny /64-divisible shapes for a CPU smoke of all the variants
if int(os.environ.get("TK_SMALL", "0")):
    FH, FW, CH, CW = 128, 128, 64, 64
else:
    FH, FW, CH, CW = 1024, 768, 256, 192

KNOCKS = ("no_cond", "no_vgg", "no_fm", "no_d_in_g", "reuse_ng",
          "no_d_update", "no_g_bwd", "no_opt")


def make_step(tr: GeneratorTrainer, knocks: frozenset):
    """A copy of GeneratorTrainer._train_step_body with knockout switches.

    Kept structurally identical to train/generator_trainer.py:158-226 so the
    FULL variant (knocks=∅) compiles to the production step graph.
    """
    tcfg = tr.tcfg

    def step(state, batch, rng, frozen):
        cast = (lambda t: cast_floating(t, jnp.bfloat16)) if tcfg.bf16 \
            else (lambda t: t)
        batch = cast(batch)
        frozen = cast(frozen)
        if "no_cond" in knocks:
            # GT-style stub: keeps gen_in/parse7/labels shapes, kills the
            # frozen tocg + full-res warp chain
            labels = jnp.argmax(batch["parse"][..., :7], axis=-1)
            parse7 = (labels[..., None] ==
                      jnp.arange(7, dtype=jnp.int32)).astype(jnp.float32)
            gen_in = jnp.concatenate(
                [batch["agnostic"], batch["densepose"], batch["parse_cloth"]],
                axis=-1)
            gen_in, parse7, labels = map(
                jax.lax.stop_gradient, (gen_in, parse7, labels))
        else:
            gen_in, parse7, labels = tr.conditioning(batch, frozen.get("tocg"))
        im = batch["image"]
        rng_g, rng_d = jax.random.split(rng)
        d_vars = cast(state.d.variables())

        def g_loss_fn(p):
            out = tr.gen.apply({"params": cast(p), **state.g.extras},
                               gen_in, labels, train=True, update_sn=True,
                               rngs={"noise": rng_g},
                               mutable=list(state.g.extras.keys()))
            output, new_g_vars = out if isinstance(out, tuple) else (out, {})
            losses = {}
            if "no_d_in_g" in knocks:
                losses["GAN"] = jnp.mean(output.astype(jnp.float32))
            else:
                pred_fake, pred_real, _ = tr._d_forward(d_vars, parse7,
                                                        output, im)
                losses["GAN"] = gan_loss(pred_fake, True, "hinge",
                                         for_discriminator=False)
                if "no_fm" not in knocks:
                    losses["GAN_Feat"] = feature_matching_loss(
                        pred_fake, pred_real, tcfg.lambda_feat)
            if "no_vgg" not in knocks:
                losses["VGG"] = jax.checkpoint(vgg_perceptual_loss)(
                    frozen["vgg"], output, im) * tcfg.lambda_vgg
            total = sum(losses.values())
            # carry the full-res output through aux ONLY when the reuse_ng
            # knock consumes it — a dead (B, H, W, 3) aux primal output is a
            # graph difference vs the production step
            return total, (new_g_vars,
                           output if "reuse_ng" in knocks else None)

        if "no_g_bwd" in knocks:
            loss_g, (new_g_vars, output) = g_loss_fn(state.g.params)
            grads = jax.tree_util.tree_map(jnp.zeros_like, state.g.params)
        else:
            (loss_g, (new_g_vars, output)), grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        if "no_opt" in knocks:
            # grads-CONSUMING stub (g*0 update), NOT a dropped update: unused
            # grads would let XLA DCE the whole backward and the knock would
            # attribute backward+optimizer together (measured: 370 vs 544 ms)
            g_params = optax.apply_updates(
                state.g.params,
                jax.tree_util.tree_map(lambda g: g * jnp.zeros((), g.dtype),
                                       grads))
            g_opt = state.g.opt_state
        else:
            g_updates, g_opt = tr.g_tx.update(grads, state.g.opt_state,
                                              state.g.params)
            g_params = optax.apply_updates(state.g.params, g_updates)
        g_extras = {k: new_g_vars.get(k, state.g.extras[k])
                    for k in state.g.extras}
        g_state = NetState(g_params, g_extras, g_opt)

        if "no_d_update" in knocks:
            d_state = state.d
            loss_d = jnp.float32(0)
        else:
            if "reuse_ng" in knocks:
                output_ng = jax.lax.stop_gradient(output)
            else:
                output_ng = jax.lax.stop_gradient(tr.gen.apply(
                    {"params": cast(g_params), **g_extras}, gen_in, labels,
                    train=True, update_sn=False, rngs={"noise": rng_d}))

            def d_loss_fn(p):
                dv = {"params": cast(p), **state.d.extras}
                pred_fake, pred_real, new_d_vars = tr._d_forward(
                    dv, parse7, output_ng, im, update_sn=True)
                l_fake = gan_loss(pred_fake, False, "hinge",
                                  for_discriminator=True)
                l_real = gan_loss(pred_real, True, "hinge",
                                  for_discriminator=True)
                return l_fake + l_real, new_d_vars

            (loss_d, new_d_vars), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d.params)
            if "no_opt" in knocks:
                d_params = optax.apply_updates(
                    state.d.params,
                    jax.tree_util.tree_map(
                        lambda g: g * jnp.zeros((), g.dtype), d_grads))
                d_opt = state.d.opt_state
            else:
                d_updates, d_opt = tr.d_tx.update(d_grads, state.d.opt_state,
                                                  state.d.params)
                d_params = optax.apply_updates(state.d.params, d_updates)
            d_extras = {k: new_d_vars.get(k, state.d.extras[k])
                        for k in state.d.extras} if new_d_vars else state.d.extras
            d_state = NetState(d_params, d_extras, d_opt)

        return GANState(state.step + 1, g_state, d_state), loss_g + loss_d

    return step


def timeit_steps(tag, tr, knocks, state, batch, frozen):
    from hrviton_tpu.ops.conv3x3 import taps_wgrad
    if knocks == ("prod",):
        # the PRODUCTION step in the identical harness — the baseline that
        # anchors this tool's full variant to bench_train.py's number
        step = lambda st, b, r, f: (
            lambda sm: (sm[0], sm[1]["loss/gen"] + sm[1]["loss/dis"]))(
            tr.train_step(st, b, r, f))
    else:
        step = make_step(tr, frozenset(knocks))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(state, batch, rngk, frozen):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            with taps_wgrad(tr.tcfg.taps_wgrad):
                st2, loss = step(st, batch, sub, frozen)
            return (st2, key), loss
        (state, _), losses = jax.lax.scan(body, (state, jax.random.PRNGKey(2)),
                                          None, length=N)
        return state, losses

    state = jax.tree_util.tree_map(jnp.copy, state)  # donation-safe
    try:
        state2, losses = steps(state, batch, None, frozen)
        float(losses[-1])
        best = float("inf")
        for _ in range(2):
            state2, losses = steps(state2, batch, None, frozen)
            float(losses[-1])   # SYNC before t0 — an un-synced async dispatch
            # still executing at t0 doubles the timed window (measured: the
            # same graph read 1430 ms/step here vs 721 in bench_train.py)
            t0 = time.perf_counter()
            state2, losses = steps(state2, batch, None, frozen)
            float(losses[-1])
            best = min(best, time.perf_counter() - t0)
    except Exception as e:
        print(f"{tag:44s}    FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}", flush=True)
        return float("inf")
    print(f"{tag:44s} {best / N * 1e3:9.1f} ms/step", flush=True)
    return best / N


def main():
    rng = np.random.default_rng(0)
    small = int(os.environ.get("TK_SMALL", "0"))
    pcfg = PipelineConfig(fine_height=FH, fine_width=FW,
                          cond_height=CH, cond_width=CW)
    tocg_cfg = TOCGConfig(ngf=8 if small else 96)
    tocg = ConditionGenerator(tocg_cfg)
    k = jax.random.PRNGKey(0)
    tv = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k)
    vgg = make_vgg_loss(image_hw=(64, 48) if small else (256, 192))

    def arr(c):
        return jnp.asarray(rng.standard_normal((B, FH, FW, c)), jnp.float32)

    labels = rng.integers(0, 13, (B, FH, FW)).astype(np.int32)
    parse = jnp.asarray(labels[..., None] == np.arange(13), dtype=jnp.float32)
    batch = {"cloth": arr(3),
             "cloth_mask": jnp.asarray(rng.uniform(0, 1, (B, FH, FW, 1)),
                                       jnp.float32),
             "parse_agnostic": arr(13), "densepose": arr(3),
             "agnostic": arr(3), "image": arr(3), "parse": parse,
             "parse_cloth": arr(3)}
    frozen = bf16_params({"vgg": vgg.variables, "tocg": tv})
    batch = bf16_params(batch)

    tcfg = GeneratorTrainConfig(
        batch_size=B, bf16=True,
        split_d_batch=bool(int(os.environ.get("TK_SPLIT_D", "0"))),
        taps_wgrad=bool(int(os.environ.get("TK_TAPS", "1"))))
    gcfg = SPADEGenConfig(ngf=8 if small else 64, fine_height=FH,
                          fine_width=FW,
                          num_upsampling_layers="more" if small else "most",
                          remat=bool(int(os.environ.get("TK_REMAT", "1"))),
                          # training default (cli/train_generator.py): the
                          # unit VJP makes fused blocks a training loss (r5)
                          fused_block=bool(int(os.environ.get("TK_FUSED",
                                                              "0"))))
    tr = GeneratorTrainer(gcfg, SPADEDiscriminatorConfig(), tcfg, pcfg,
                          tocg_cfg)
    state = tr.init(jax.random.PRNGKey(1))

    which = sys.argv[1:] or ["prod", "full"] + list(KNOCKS) + ["skeleton"]
    t_full = None
    for name in which:
        knocks = (() if name == "full" else
                  ("prod",) if name == "prod" else
                  KNOCKS if name == "skeleton" else (name,))
        t = timeit_steps(f"step b{B} {name}", tr, knocks, state, batch, frozen)
        if name == "full":
            t_full = t
        elif t_full is not None:
            print(f"  -> attributed: {1e3 * (t_full - t):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
