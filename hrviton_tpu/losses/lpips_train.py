"""LPIPS lin-head training — TPU rebuild of the reference DistModel's
training path (/root/reference/eval_models/dist_model.py:115-210 and
networks_basic.py:114-141), which the vendored package carries but no
reference CLI ever invokes (recorded in PARITY.md; closed here, C13).

Behavioral contract replicated:
  * Dist2LogitLayer: 1x1 conv MLP 5 -> chn_mid -> chn_mid -> 1 with
    LeakyReLU(0.2) and sigmoid, fed (d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps))
    (networks_basic.py:114-129).
  * BCERankingLoss: BCE of that logit against the human preference fraction
    per = (judge+1)/2 where the trainer passes judge*2-1, i.e. the raw [0,1]
    judge (networks_basic.py:131-141, dist_model.py:158-163).
  * One optimization step = forward on both (ref,p0) and (ref,p1) with
    NetLinLayer dropout active, Adam(lr, betas=(0.5, 0.999)) over the lin
    heads + rank net (+ backbone only when pnet_tune — networks_basic.py:50
    requires_grad semantics), then clamp every lin-head 1x1 kernel to >= 0
    (dist_model.py:121-131).
  * Accuracy bookkeeping d1_lt_d0*judge + (1-d1_lt_d0)*(1-judge)
    (dist_model.py:169-172) and linear lr decay old_lr - lr/nepoch_decay
    (dist_model.py:200-208).

TPU-first deltas: the whole step (two LPIPS forwards, rank net, BCE, Adam,
clamp) is ONE jitted donated function; the frozen backbone is a captured
constant so XLA folds its weights and no optimizer state is allocated for it.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.core import freeze, unfreeze

from hrviton_tpu.losses.lpips import LPIPSModel
from hrviton_tpu.nn.layers import Conv2d

__all__ = ["Dist2LogitLayer", "bce_ranking_loss", "LPIPSHeadTrainer"]


class Dist2LogitLayer(nn.Module):
    """networks_basic.py:114-129 — distances -> predicted human judgment."""

    chn_mid: int = 32
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, d0, d1, eps: float = 0.1):
        d0 = d0.reshape(d0.shape[0], 1, 1, 1).astype(jnp.float32)
        d1 = d1.reshape(d1.shape[0], 1, 1, 1).astype(jnp.float32)
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)
        x = Conv2d(self.chn_mid, 1, name="fc0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = Conv2d(self.chn_mid, 1, name="fc1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = Conv2d(1, 1, name="fc2")(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x[:, 0, 0, 0]


def bce_ranking_loss(logit, per, eps: float = 1e-12):
    """torch.nn.BCELoss on the rank logit vs preference fraction ``per``
    (networks_basic.py:136-141). torch clamps each log term at -100."""
    logl = jnp.maximum(jnp.log(logit + eps), -100.0)
    log1 = jnp.maximum(jnp.log(1.0 - logit + eps), -100.0)
    return -jnp.mean(per * logl + (1.0 - per) * log1)


def _lin_head_paths(params: Dict) -> Tuple[str, ...]:
    return tuple(k for k in params if k.startswith("lin"))


class LPIPSHeadTrainer:
    """Trains the net-lin calibration on 2AFC triplets (ref, p0, p1, judge).

    judge is the human preference fraction in [0, 1] (0 = p0 preferred).
    """

    def __init__(self, net: str = "alex", lr: float = 1e-4,
                 beta1: float = 0.5, pnet_tune: bool = False,
                 variables: Optional[Dict] = None,
                 rng: Optional[jax.Array] = None,
                 image_hw: Tuple[int, int] = (64, 64)):
        self.model = LPIPSModel(net=net, lpips=True)
        self.rank = Dist2LogitLayer()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_model, k_rank, self._drop = jax.random.split(rng, 3)
        if variables is None:
            z = jnp.zeros((1, *image_hw, 3), jnp.float32)
            variables = self.model.init(k_model, z, z)
        params = unfreeze(variables)["params"] if "params" in variables \
            else dict(variables)
        heads = set(_lin_head_paths(params))
        self._frozen = {k: v for k, v in params.items()
                        if k not in heads and not pnet_tune}
        trainable_model = {k: v for k, v in params.items()
                           if k in heads or pnet_tune}
        rank_params = unfreeze(self.rank.init(
            k_rank, jnp.zeros((1,)), jnp.zeros((1,))))["params"]
        self.lr = lr
        self.old_lr = lr
        self._tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=beta1, b2=0.999, eps=1e-8)
        self.params = {"model": trainable_model, "rank": rank_params}
        self.opt_state = self._tx.init(self.params)
        self._step = jax.jit(self._make_step(), donate_argnums=(0, 1))

    # -------------------------------------------------------------- internals

    def _make_step(self):
        model, rank, tx, frozen = self.model, self.rank, self._tx, self._frozen

        def distances(model_params, ref, p0, p1, drop_rng):
            params = dict(frozen, **model_params)
            k0, k1 = jax.random.split(drop_rng)
            d0 = model.apply({"params": params}, ref, p0, train=True,
                             rngs={"dropout": k0})
            d1 = model.apply({"params": params}, ref, p1, train=True,
                             rngs={"dropout": k1})
            return d0, d1

        def step(params, opt_state, ref, p0, p1, judge, drop_rng):
            def loss_fn(p):
                d0, d1 = distances(p["model"], ref, p0, p1, drop_rng)
                logit = rank.apply({"params": p["rank"]}, d0, d1)
                loss = bce_ranking_loss(logit, judge)
                return loss, (d0, d1)

            (loss, (d0, d1)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # clamp_weights (dist_model.py:127-131): every 1x1 conv kernel in
            # self.net — i.e. the lin heads, not the rank net — floors at 0.
            for k in _lin_head_paths(params["model"]):
                kern = params["model"][k]["conv"]["kernel"]
                params["model"][k]["conv"]["kernel"] = jnp.maximum(kern, 0.0)
            d1_lt_d0 = (d1 < d0).astype(jnp.float32)
            acc = jnp.mean(d1_lt_d0 * judge + (1.0 - d1_lt_d0) * (1.0 - judge))
            return params, opt_state, loss, acc

        return step

    # ------------------------------------------------------------------- API

    def train_step(self, ref, p0, p1, judge):
        """One optimize_parameters() step; returns (loss, acc_r)."""
        self._drop, k = jax.random.split(self._drop)
        self.params, self.opt_state, loss, acc = self._step(
            self.params, self.opt_state, ref, p0, p1,
            jnp.asarray(judge, jnp.float32), k)
        return float(loss), float(acc)

    def update_learning_rate(self, nepoch_decay: int) -> float:
        """dist_model.py:200-208 linear decay."""
        self.old_lr = self.old_lr - self.lr / nepoch_decay
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            self.old_lr, jnp.float32)
        return self.old_lr

    def trained_variables(self) -> Dict:
        """Full LPIPS variables with the trained heads merged back in —
        drop-in for LPIPSFn / make_lpips scoring."""
        return freeze({"params": dict(self._frozen, **self.params["model"])})
