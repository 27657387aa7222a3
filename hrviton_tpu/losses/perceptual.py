"""VGG19 perceptual loss (/root/reference/networks.py:234-251).

L1 distance between VGG19 slice activations of x and stop-gradient(y), with
slice weights [1/32, 1/16, 1/8, 1/4, 1]. The reference feeds [-1, 1] images
directly (no ImageNet renormalization) — preserved here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hrviton_tpu.models.backbones import Vgg19Features

__all__ = ["VGGLossFn", "make_vgg_loss", "vgg_perceptual_loss"]

_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_features(vgg_variables, y):
    """Stop-gradient VGG19 slice activations of a TARGET image — for use
    with ``vgg_perceptual_loss(..., y_feats=...)`` so the target tower can
    be computed OUTSIDE a jax.checkpoint region (it carries no gradients;
    recomputing it in the backward is pure waste — measured ~1/5 of the
    108 ms full-res VGG cost in the stage-2 step, tools/exp_train_knockout)."""
    fy = Vgg19Features().apply(vgg_variables, jax.lax.stop_gradient(y))
    return [jax.lax.stop_gradient(f) for f in fy]


def vgg_perceptual_loss(vgg_variables, x, y=None,
                        layids: Optional[Sequence[int]] = None,
                        y_feats=None):
    """Functional VGG loss: pass the backbone variables explicitly so they ride
    as jit arguments (device buffers), never as HLO constants — embedding
    ~80 MB of weights in the program breaks remote-compile transports and
    bloats every executable.

    Pass the target as ``y`` (image; its tower is computed here) or as
    ``y_feats`` (``vgg_features(y)`` precomputed outside the caller's
    checkpoint region) — identical numerics either way."""
    vgg = Vgg19Features()
    fx = vgg.apply(vgg_variables, x)
    fy = vgg_features(vgg_variables, y) if y_feats is None else y_feats
    ids = layids if layids is not None else range(len(fx))
    loss = 0.0
    for i in ids:
        loss = loss + _WEIGHTS[i] * jnp.mean(
            jnp.abs(fx[i].astype(jnp.float32) -
                    jax.lax.stop_gradient(fy[i]).astype(jnp.float32)))
    return loss


class VGGLossFn:
    """Callable VGG perceptual loss closed over frozen backbone params.

    Convenience wrapper for eval/off-device use; inside jitted train steps use
    ``vgg_perceptual_loss`` with the variables as an argument instead."""

    def __init__(self, vgg_variables, layids: Optional[Sequence[int]] = None):
        self.variables = vgg_variables
        self._layids = layids

    def __call__(self, x, y):
        return vgg_perceptual_loss(self.variables, x, y, self._layids)


def make_vgg_loss(vgg_variables=None, rng=None, image_hw=(256, 192)) -> VGGLossFn:
    """Build a VGG loss; random-init backbone if no ported weights given."""
    if vgg_variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        vgg_variables = Vgg19Features().init(
            rng, jnp.zeros((1, *image_hw, 3), jnp.float32))
    return VGGLossFn(vgg_variables)
