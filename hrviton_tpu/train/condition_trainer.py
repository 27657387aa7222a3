"""Stage-1 training: try-on condition generator + multiscale D.

One jitted step replicating /root/reference/train_condition.py:113-312:
  G loss = 10·L1(warped cloth-mask) + VGG(warped cloth) + tv_lambda·TV
           + 10·CE(segmap) + 1·LSGAN, D loss = LSGAN(fake) + LSGAN(real).

Data parallelism: jit the step with the batch sharded over the mesh 'data'
axis — BatchNorm moments and loss means become global-batch statistics
(TPU-native SyncBN, see hrviton_tpu.core.mesh).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hrviton_tpu.config import (CondDiscriminatorConfig, ConditionTrainConfig,
                                TOCGConfig)
from hrviton_tpu.losses.gan import lsgan_loss
from hrviton_tpu.losses.perceptual import vgg_features, vgg_perceptual_loss
from hrviton_tpu.losses.seg import cross_entropy2d, iou_metric
from hrviton_tpu.losses.tv import flow_tv_suite
from hrviton_tpu.models import CondMultiscaleDiscriminator, ConditionGenerator
from hrviton_tpu.ops.grid_sample import grid_sample, make_grid
from hrviton_tpu.ops.resize import resize_flow
from hrviton_tpu.pipelines.tryon import compose_clothmask, remove_overlap
from hrviton_tpu.core.precision import cast_floating
from hrviton_tpu.train.optim import adam
from hrviton_tpu.train.state import GANState, NetState

__all__ = ["ConditionTrainer"]


def _prep(batch) -> Dict[str, jax.Array]:
    """Assemble tocg inputs + targets (train_condition.py:135-155)."""
    cm = (batch["cloth_mask"]["paired"] > 0.5).astype(jnp.float32)
    return dict(
        input1=jnp.concatenate([batch["cloth"]["paired"], cm], axis=-1),
        input2=jnp.concatenate([batch["parse_agnostic"], batch["densepose"]],
                               axis=-1),
        cm=cm,
        label_onehot=batch["parse_onehot"].astype(jnp.int32),
        label=batch["parse"],
        pcm=batch["pcm"],
        im_c=batch["parse_cloth"],
    )


class ConditionTrainer:
    def __init__(self, tocg_cfg: TOCGConfig, d_cfg: CondDiscriminatorConfig,
                 tcfg: ConditionTrainConfig):
        self.tocg = ConditionGenerator(tocg_cfg)
        self.d = CondMultiscaleDiscriminator(d_cfg)
        self.tcfg = tcfg
        self.d_cfg = d_cfg
        self.tocg_cfg = tocg_cfg
        self.g_tx = adam(tcfg.g_lr, tcfg.beta1, tcfg.beta2)
        self.d_tx = adam(tcfg.d_lr, tcfg.beta1, tcfg.beta2)

    # ------------------------------------------------------------------ init
    def init(self, rng, cond_hw=(256, 192)) -> GANState:
        h, w = cond_hw
        kg, kd = jax.random.split(rng)
        in1 = jnp.zeros((1, h, w, 4))
        in2 = jnp.zeros((1, h, w, 16))
        # jitted inits: eager init is pathologically slow over a device tunnel
        gv = jax.jit(lambda k: self.tocg.init(k, in1, in2, train=False))(kg)

        d_in = jnp.zeros((1, h, w, self.d_cfg.input_nc))

        def d_init(k):
            d_rngs = {"params": k}
            if self.d_cfg.ddropout:
                d_rngs["dropout"] = k
            return self.d.init(d_rngs, d_in, train=False)

        dv = jax.jit(d_init)(kd)

        def split(v):
            v = dict(v)
            params = v.pop("params")
            return params, v

        gp, ge = split(gv)
        dp, de = split(dv)
        return GANState(
            step=jnp.zeros((), jnp.int32),
            g=NetState(gp, ge, self.g_tx.init(gp)),
            d=NetState(dp, de, self.d_tx.init(dp)),
        )

    # ------------------------------------------------------------ tocg losses
    def _forward_and_losses(self, g_params, g_extras, d_vars, vgg_vars, prep,
                            rng, train: bool = True):
        tcfg = self.tcfg
        (flow_list, seg, warped_c, warped_cm), new_vars = self.tocg.apply(
            {"params": g_params, **g_extras}, prep["input1"], prep["input2"],
            train=train, mutable=list(g_extras.keys()) if train else [])

        seg = compose_clothmask(seg, warped_cm, tcfg.clothmask_composition)

        if tcfg.occlusion:
            warped_cm = remove_overlap(jax.nn.softmax(seg, axis=-1), warped_cm)
            warped_c = warped_c * warped_cm + (1.0 - warped_cm)

        loss_l1 = jnp.mean(jnp.abs(warped_cm - prep["pcm"]))
        # one target tower for the main + 4 interflow VGG terms (same target
        # image and resolution for all five; exact — see vgg_features)
        im_c_feats = vgg_features(vgg_vars, prep["im_c"])
        loss_vgg = vgg_perceptual_loss(vgg_vars, warped_c,
                                       y_feats=im_c_feats)

        loss_tv = flow_tv_suite(
            flow_list, warped_clothmask=warped_cm,
            edgeawaretv=tcfg.edgeawaretv, lasttvonly=tcfg.lasttvonly,
            add_lasttv=tcfg.add_lasttv)

        if tcfg.interflowloss:
            # intermediate multiscale warp loss (train_condition.py:237-248);
            # normalization uses each flow's own native extent.
            n, ih, iw, _ = prep["input1"].shape
            grid = make_grid(n, ih, iw)
            cloth = prep["input1"][..., :3]
            cmask = prep["cm"]
            seg_softmax = jax.nn.softmax(seg, axis=-1)
            for i, flow in enumerate(flow_list[:-1]):
                fh, fw = flow.shape[1:3]
                # intermediate flows upsample with opt.upsample, not a fixed
                # mode (train_condition.py:243)
                fl = resize_flow(flow, (ih, iw), mode=self.tocg_cfg.upsample)
                fn = jnp.stack([fl[..., 0] / ((fw - 1.0) / 2.0),
                                fl[..., 1] / ((fh - 1.0) / 2.0)], axis=-1)
                wc = grid_sample(cloth, fn + grid, padding_mode="border")
                wm = grid_sample(cmask, fn + grid, padding_mode="border")
                wm = remove_overlap(seg_softmax, wm)
                loss_l1 = loss_l1 + jnp.mean(jnp.abs(wm - prep["pcm"])) / 2 ** (4 - i)
                loss_vgg = loss_vgg + vgg_perceptual_loss(
                    vgg_vars, wc, y_feats=im_c_feats) / 2 ** (4 - i)

        ce = cross_entropy2d(seg, prep["label_onehot"])

        losses = dict(l1_cloth=loss_l1, vgg=loss_vgg, tv=loss_tv, ce=ce)
        loss_g = (tcfg.l1_lambda * loss_l1 + loss_vgg + tcfg.tv_lambda * loss_tv
                  + ce * tcfg.ce_lambda)

        seg_softmax = jax.nn.softmax(seg, axis=-1)
        if not tcfg.no_gan_loss:
            d_in = jnp.concatenate(
                [jax.lax.stop_gradient(prep["input1"]),
                 jax.lax.stop_gradient(prep["input2"]), seg_softmax], axis=-1)
            pred = self._d_apply(d_vars, d_in, rng, train=True)
            g_gan = lsgan_loss(pred, True)
            losses["gan"] = g_gan
            loss_g = loss_g + g_gan * tcfg.gan_lambda

        return loss_g, (new_vars, seg_softmax, losses)

    def _d_apply(self, d_vars, x, rng, train: bool, update_sn: bool = False):
        kwargs = {}
        mutable = False  # [] would still switch flax to the tuple return
        if self.d_cfg.ddropout:
            kwargs["rngs"] = {"dropout": rng}
        if self.d_cfg.spectral and update_sn:
            mutable = ["aux"]
        return self.d.apply(d_vars, x, train=train, update_sn=update_sn,
                            mutable=mutable, **kwargs)

    # ------------------------------------------------------------- train step
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GANState, batch, rng,
                   vgg_vars) -> Tuple[GANState, Dict]:
        """vgg_vars ride as a jit argument (never HLO constants)."""
        tcfg = self.tcfg
        prep = _prep(batch)
        rng_g, rng_d, rng_d2 = jax.random.split(rng, 3)

        # bf16 policy: master params/opt state stay f32; compute casts here.
        # The cast is differentiable, so grads arrive f32 (apex-AMP-O1
        # equivalent without loss scaling — bf16 range makes it unneeded).
        cast = (lambda t: cast_floating(t, jnp.bfloat16)) if tcfg.bf16 \
            else (lambda t: t)
        prep = cast(prep)
        vgg_c = cast(vgg_vars)
        d_vars = cast(state.d.variables())

        # ---- G update
        def g_loss_fn(p):
            return self._forward_and_losses(cast(p), state.g.extras, d_vars,
                                            vgg_c, prep, rng_g, train=True)

        (loss_g, (new_g_vars, seg_softmax, losses)), grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        g_updates, g_opt = self.g_tx.update(grads, state.g.opt_state,
                                            state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)
        g_extras = {k: new_g_vars[k] for k in state.g.extras}
        g_state = NetState(g_params, g_extras, g_opt)

        metrics = {f"loss/G/{k}": v for k, v in losses.items()}
        metrics["loss/G"] = loss_g

        # ---- D update (train_condition.py:268-312)
        if not tcfg.no_gan_loss:
            if tcfg.g_d_separate:
                # fresh no-grad forward with the *updated* G
                (fl, seg2, wc2, wcm2), _ = self.tocg.apply(
                    {"params": cast(g_params), **g_extras}, prep["input1"],
                    prep["input2"], train=True, mutable=list(g_extras.keys()))
                seg2 = compose_clothmask(seg2, wcm2, tcfg.clothmask_composition)
                fake_softmax = jax.lax.stop_gradient(jax.nn.softmax(seg2, -1))
            else:
                fake_softmax = jax.lax.stop_gradient(seg_softmax)

            base = jnp.concatenate(
                [jax.lax.stop_gradient(prep["input1"]),
                 jax.lax.stop_gradient(prep["input2"])], axis=-1)

            def d_loss_fn(p):
                dv = {"params": cast(p), **state.d.extras}
                out_f = self._d_apply(dv, jnp.concatenate(
                    [base, fake_softmax], -1), rng_d, train=True, update_sn=True)
                if isinstance(out_f, tuple):
                    pred_f, new_d_vars = out_f
                    new_extras = {k: new_d_vars[k] for k in state.d.extras}
                else:
                    pred_f, new_extras = out_f, state.d.extras
                pred_r = self._d_apply(
                    dv, jnp.concatenate([base, prep["label"]], -1),
                    rng_d2, train=True)
                if isinstance(pred_r, tuple):
                    pred_r = pred_r[0]
                l_fake = lsgan_loss(pred_f, False)
                l_real = lsgan_loss(pred_r, True)
                return l_fake + l_real, (l_fake, l_real, new_extras)

            (loss_d, (l_fake, l_real, d_extras)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d.params)
            d_updates, d_opt = self.d_tx.update(d_grads, state.d.opt_state,
                                                state.d.params)
            d_params = optax.apply_updates(state.d.params, d_updates)
            d_state = NetState(d_params, d_extras, d_opt)
            metrics.update({"loss/D": loss_d, "loss/D/pred_fake": l_fake,
                            "loss/D/pred_real": l_real})
        else:
            d_state = state.d

        return GANState(state.step + 1, g_state, d_state), metrics

    # ----------------------------------------------------------- visualization
    @functools.partial(jax.jit, static_argnums=0)
    def visualize(self, state: GANState, batch):
        """Eval-mode forward for TensorBoard panels
        (train_condition.py:400-436): returns composed segmap softmax, warped
        cloth/mask and the misalignment map."""
        prep = _prep(batch)
        flow_list, seg, warped_c, warped_cm = self.tocg.apply(
            state.g.variables(), prep["input1"], prep["input2"], train=False)
        warped_cm_onehot = (warped_cm > 0.5).astype(jnp.float32)
        seg = compose_clothmask(seg, warped_cm, self.tcfg.clothmask_composition)
        if self.tcfg.occlusion:
            warped_cm = remove_overlap(jax.nn.softmax(seg, -1), warped_cm)
            warped_c = warped_c * warped_cm + (1.0 - warped_cm)
        fake_cm = (jnp.argmax(seg, -1, keepdims=True) == 3).astype(jnp.float32)
        misalign = jnp.clip(fake_cm - warped_cm_onehot, 0.0, None)
        return dict(seg_softmax=jax.nn.softmax(seg, -1), warped_cloth=warped_c,
                    warped_cm_onehot=warped_cm_onehot, misalign=misalign)

    # -------------------------------------------------------------- validation
    @functools.partial(jax.jit, static_argnums=0)
    def eval_iou(self, state: GANState, batch) -> jax.Array:
        """Validation IoU over composed softmax segmaps
        (train_condition.py:314-360)."""
        prep = _prep(batch)
        flow_list, seg, _, warped_cm = self.tocg.apply(
            state.g.variables(), prep["input1"], prep["input2"], train=False)
        seg = compose_clothmask(seg, warped_cm, self.tcfg.clothmask_composition)
        return iou_metric(jax.nn.softmax(seg, axis=-1), prep["label"])
