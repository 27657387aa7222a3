"""Stage-2 training: SPADE image generator + multiscale D, frozen tocg.

One jitted step replicating /root/reference/train_generator.py:184-360:
  conditioning (no-grad, tocg at 256x192 -> full-res warp/parse, :201-275),
  G loss = hinge + 10·feature-matching + 10·VGG, then D hinge step on a fresh
  no-grad generator output. TTUR Adam(0, 0.9) with linear decay after
  keep_step, stepped per 1000 iters. bf16-safe (no loss scaling needed).

All frozen weights (tocg, VGG) are jit *arguments* — passing them as closures
would embed hundreds of MB of constants in the HLO, which bloats executables
and overflows remote-compile transports.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.losses.gan import gan_loss
from hrviton_tpu.losses.matching import feature_matching_loss
from hrviton_tpu.losses.perceptual import vgg_perceptual_loss
from hrviton_tpu.models import (ConditionGenerator, SPADEGenerator,
                                SPADEMultiscaleDiscriminator)
from hrviton_tpu.core.precision import cast_floating
from hrviton_tpu.ops.parse import group_index_of_label13, lut_lookup
from hrviton_tpu.pipelines.tryon import condition_forward
from hrviton_tpu.train.optim import adam, lambda_decay_schedule
from hrviton_tpu.train.state import GANState, NetState

__all__ = ["GeneratorTrainer"]


class GeneratorTrainer:
    def __init__(self, gen_cfg: SPADEGenConfig, d_cfg: SPADEDiscriminatorConfig,
                 tcfg: GeneratorTrainConfig, pcfg: PipelineConfig,
                 tocg_cfg: Optional[TOCGConfig] = None):
        """tocg_cfg: frozen condition generator architecture; None in --GT mode
        (train_generator.py:102,253-256) — its weights are passed per-step."""
        self.gen = SPADEGenerator(gen_cfg)
        self.d = SPADEMultiscaleDiscriminator(d_cfg)
        self.tocg = ConditionGenerator(tocg_cfg) if tocg_cfg is not None else None
        self.tcfg = tcfg
        self.pcfg = pcfg
        sched = lambda_decay_schedule(tcfg.keep_step, tcfg.decay_step,
                                      tcfg.load_step)
        self.g_tx = adam(tcfg.g_lr, tcfg.beta1, tcfg.beta2, schedule=sched)
        self.d_tx = adam(tcfg.d_lr, tcfg.beta1, tcfg.beta2, schedule=sched)
        self.gen_cfg = gen_cfg
        self.d_cfg = d_cfg

    # ------------------------------------------------------------------ init
    def init(self, rng) -> GANState:
        h, w = self.gen_cfg.fine_height, self.gen_cfg.fine_width
        kg, kn, kd = jax.random.split(rng, 3)
        gv = jax.jit(lambda a, b: self.gen.init(
            {"params": a, "noise": b},
            jnp.zeros((1, h, w, self.gen_cfg.input_nc)),
            jnp.zeros((1, h, w, self.gen_cfg.gen_semantic_nc)),
            train=False))(kg, kn)
        dv = jax.jit(lambda k: self.d.init(
            k, jnp.zeros((1, h, w, self.d_cfg.input_nc)), train=False))(kd)

        def split(v):
            v = dict(v)
            return v.pop("params"), v

        gp, ge = split(gv)
        dp, de = split(dv)
        return GANState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(gp, ge, self.g_tx.init(gp)),
            d=NetState(dp, de, self.d_tx.init(dp)),
        )

    # ---------------------------------------------------------- conditioning
    def conditioning(self, batch, tocg_vars=None):
        """No-grad conditioning (train_generator.py:201-275): returns the
        9-channel generator input, the 7-channel parse (for the D), and the
        compact 7-way int label map (the generator's fusion-friendly seg
        form — bit-identical, see models/spade.py seg_for)."""
        if self.tcfg.gt_mode or self.tocg is None:
            fake_parse = jnp.argmax(batch["parse"], axis=-1)
            warped_cloth = batch["parse_cloth"]
        else:
            def tocg_apply(i1, i2):
                return self.tocg.apply(tocg_vars, i1, i2, train=False)
            cond = condition_forward(tocg_apply, batch, self.pcfg)
            fake_parse = cond.fake_parse
            warped_cloth = cond.warped_cloth
        # LUT form of the 13->7 regroup (exact for argmax one-hots;
        # see pipelines/tryon.py) -- gather-free compare-select chain
        glabel = lut_lookup(fake_parse, group_index_of_label13())
        parse7 = (glabel[..., None] ==
                  jnp.arange(7, dtype=jnp.int32)).astype(jnp.float32)
        gen_in = jnp.concatenate(
            [batch["agnostic"], batch["densepose"], warped_cloth], axis=-1)
        return (jax.lax.stop_gradient(gen_in),
                jax.lax.stop_gradient(parse7),
                jax.lax.stop_gradient(glabel.astype(jnp.int32)))

    def _d_forward(self, d_vars, parse7, fake, real, update_sn: bool = False):
        """Concat-batch D forward (train_generator.py:281-295): instance-norm D
        makes per-sample stats, so fake/real see identical parameters."""
        fake_concat = jnp.concatenate([parse7, fake], axis=-1)
        real_concat = jnp.concatenate([parse7, real], axis=-1)

        # mutable=False, not []: an empty mutable list still switches flax to
        # the (out, vars) tuple return. jax.checkpoint: recompute D activations
        # in backward — full-res GAN training does not fit 16G HBM otherwise.
        def d_fwd(dv_, x_):
            return self.d.apply(dv_, x_, train=True, update_sn=update_sn,
                                mutable=["aux"] if update_sn else False)

        if self.tcfg.d_remat:
            d_fwd = jax.checkpoint(d_fwd)

        new_vars = None
        if self.tcfg.split_d_batch:
            # two half-batch calls == the concat call for this D (per-sample
            # instance norms; both power iterations start from the same stored
            # u so the spectral sigmas are identical); halves peak memory
            out_f = d_fwd(d_vars, fake_concat)
            out_r = d_fwd(d_vars, real_concat)
            if update_sn:
                out_f, new_vars = out_f
                out_r, _ = out_r
            return out_f, out_r, new_vars

        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        out = d_fwd(d_vars, both)
        if update_sn:
            out, new_vars = out
        n = fake.shape[0]
        pred_fake = [[t[:n] for t in scale] for scale in out]
        pred_real = [[t[n:] for t in scale] for scale in out]
        return pred_fake, pred_real, new_vars

    # ------------------------------------------------------------- train step
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GANState, batch, rng,
                   frozen: Dict) -> Tuple[GANState, Dict]:
        """frozen: {'vgg': Vgg19Features variables, 'tocg': tocg variables or
        {} in GT mode} — frozen weights as jit arguments."""
        tcfg = self.tcfg
        # trace-time switch: conv3x3 dispatches wgrad formulation while this
        # body traces; the compiled step keeps whatever was chosen here
        from hrviton_tpu.ops.conv3x3 import taps_wgrad
        with taps_wgrad(tcfg.taps_wgrad):
            return self._train_step_body(state, batch, rng, frozen)

    def _train_step_body(self, state, batch, rng, frozen):
        tcfg = self.tcfg
        cast = (lambda t: cast_floating(t, jnp.bfloat16)) if tcfg.bf16 \
            else (lambda t: t)
        batch = cast(batch)
        frozen = cast(frozen)
        gen_in, parse7, labels = self.conditioning(batch, frozen.get("tocg"))
        im = batch["image"]
        rng_g, rng_d = jax.random.split(rng)
        d_vars = cast(state.d.variables())

        # ---- G update
        def g_loss_fn(p):
            out = self.gen.apply({"params": cast(p), **state.g.extras},
                                 gen_in, labels, train=True, update_sn=True,
                                 rngs={"noise": rng_g},
                                 mutable=list(state.g.extras.keys()))
            output, new_g_vars = out if isinstance(out, tuple) else (out, {})
            pred_fake, pred_real, _ = self._d_forward(d_vars, parse7, output, im)
            losses = {"GAN": gan_loss(pred_fake, True, "hinge",
                                      for_discriminator=False)}
            if not tcfg.no_gan_feat_loss:
                losses["GAN_Feat"] = feature_matching_loss(
                    pred_fake, pred_real, tcfg.lambda_feat)
            if not tcfg.no_vgg_loss:
                # checkpoint BOTH towers: precomputing the target tower
                # outside the checkpoint (vgg_features) and passing it as a
                # residual measured 591 vs 577 ms/step (r5) — holding the 5
                # full-res target slices (~400 MB) across the G fwd+bwd
                # costs more than the one-tower recompute it saves
                losses["VGG"] = jax.checkpoint(vgg_perceptual_loss)(
                    frozen["vgg"], output, im) * tcfg.lambda_vgg
            total = sum(losses.values())
            return total, (new_g_vars, losses)

        (loss_g, (new_g_vars, g_losses)), grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        g_updates, g_opt = self.g_tx.update(grads, state.g.opt_state,
                                            state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)
        g_extras = {k: new_g_vars.get(k, state.g.extras[k])
                    for k in state.g.extras}
        g_state = NetState(g_params, g_extras, g_opt)

        # ---- D update on a fresh no-grad output of the *updated* G
        # (train_generator.py:327-334)
        output_ng = jax.lax.stop_gradient(self.gen.apply(
            {"params": cast(g_params), **g_extras}, gen_in, labels, train=True,
            update_sn=False, rngs={"noise": rng_d}))

        def d_loss_fn(p):
            dv = {"params": cast(p), **state.d.extras}
            pred_fake, pred_real, new_d_vars = self._d_forward(
                dv, parse7, output_ng, im, update_sn=True)
            l_fake = gan_loss(pred_fake, False, "hinge", for_discriminator=True)
            l_real = gan_loss(pred_real, True, "hinge", for_discriminator=True)
            return l_fake + l_real, (l_fake, l_real, new_d_vars)

        (loss_d, (l_fake, l_real, new_d_vars)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d.params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d.opt_state,
                                            state.d.params)
        d_params = optax.apply_updates(state.d.params, d_updates)
        d_extras = {k: new_d_vars.get(k, state.d.extras[k])
                    for k in state.d.extras} if new_d_vars else state.d.extras
        d_state = NetState(d_params, d_extras, d_opt)

        metrics = {f"loss/gen/{k}": v for k, v in g_losses.items()}
        metrics.update({"loss/gen": loss_g, "loss/dis": loss_d,
                        "loss/dis/adv_fake": l_fake,
                        "loss/dis/adv_real": l_real})
        return GANState(state.step + 1, g_state, d_state), metrics

    # ------------------------------------------------------------- inference
    @functools.partial(jax.jit, static_argnums=0)
    def generate(self, state: GANState, batch, rng, tocg_vars=None):
        gen_in, _, labels = self.conditioning(batch, tocg_vars)
        return self.gen.apply(state.g.variables(), gen_in, labels,
                              train=False, rngs={"noise": rng})

    @functools.partial(jax.jit, static_argnums=0)
    def generate_debug(self, state: GANState, batch, rng, tocg_vars=None):
        """generate() + the conditioning intermediates needed for the
        reference's tensorboard grids (train_generator.py:366-476): returns
        (output, warped_cloth, fake_parse_gauss-13ch)."""
        if self.tcfg.gt_mode or self.tocg is None:
            fake_parse = jnp.argmax(batch["parse"], axis=-1)
            warped_cloth = batch["parse_cloth"]
            # the reference's GT-mode grid references an undefined
            # fake_parse_gauss (NameError, SURVEY §2.3); use the GT parse
            fpg = batch["parse"]
        else:
            def tocg_apply(i1, i2):
                return self.tocg.apply(tocg_vars, i1, i2, train=False)
            cond = condition_forward(tocg_apply, batch, self.pcfg)
            fake_parse = cond.fake_parse
            warped_cloth = cond.warped_cloth
            fpg = cond.fake_parse_gauss
        # LUT form of the 13->7 regroup (exact for argmax one-hots;
        # see pipelines/tryon.py) -- gather-free compare-select chain
        glabel = lut_lookup(fake_parse, group_index_of_label13())
        gen_in = jnp.concatenate(
            [batch["agnostic"], batch["densepose"], warped_cloth], axis=-1)
        out = self.gen.apply(state.g.variables(), gen_in,
                             glabel.astype(jnp.int32),
                             train=False, rngs={"noise": rng})
        return out, warped_cloth, fpg
