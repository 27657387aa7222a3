"""LPIPS (net-lin, alex) — perceptual distance for eval and in-train validation.

Parity with the vendored LPIPS v0.1 package
(/root/reference/eval_models/networks_basic.py:27-120):
  scale inputs with the fixed ScalingLayer (shift/scale constants), run AlexNet
  features, L2-normalize each tap over channels, squared difference, 1x1 linear
  heads (no bias), spatial average, sum over the 5 taps.

Head + backbone weights are ported from ``eval_models/weights/v0.1/alex.pth`` +
torchvision alexnet via hrviton_tpu.train.checkpoint; random init is the test
fallback.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hrviton_tpu.models.backbones import AlexNetFeatures
from hrviton_tpu.nn.layers import Conv2d, kaiming_normal_init

__all__ = ["LPIPSAlex", "LPIPSFn", "make_lpips"]

# networks_basic.py:94-102 ScalingLayer constants
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)
_ALEX_CHANNELS = (64, 192, 384, 256, 256)


def _normalize_tensor(x, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPSAlex(nn.Module):
    """Full net-lin alex distance model. Inputs in [-1, 1], NHWC."""

    @nn.compact
    def __call__(self, x, y):
        def scaled(v):
            return (v.astype(jnp.float32) - _SHIFT) / _SCALE

        backbone = AlexNetFeatures(name="alexnet")
        fx = backbone(scaled(x))
        fy = backbone(scaled(y))
        total = 0.0
        for i in range(5):
            dx = _normalize_tensor(fx[i].astype(jnp.float32))
            dy = _normalize_tensor(fy[i].astype(jnp.float32))
            diff = (dx - dy) ** 2
            lin = Conv2d(1, 1, use_bias=False,
                         kernel_init=kaiming_normal_init(), name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2))  # spatial average
        return total[..., 0]  # (N,)


class LPIPSFn:
    """Callable LPIPS closed over frozen variables."""

    def __init__(self, variables):
        self._model = LPIPSAlex()
        self._vars = variables

    def __call__(self, x, y):
        return self._model.apply(self._vars, x, y)


def make_lpips(variables=None, rng=None, image_hw=(128, 128)) -> LPIPSFn:
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z = jnp.zeros((1, *image_hw, 3), jnp.float32)
        variables = LPIPSAlex().init(rng, z, z)
    return LPIPSFn(variables)
