"""LPIPS perceptual distance — full package parity with the vendored LPIPS v0.1
(/root/reference/eval_models/, C13 in SURVEY.md):

  * net-lin distance with 'alex' | 'vgg16' | 'squeeze' backbones and learned
    1x1 linear heads (networks_basic.py:27-92); 'net' mode (lpips=False)
    uniform-averages the normalized feature distances instead.
  * L2 and DSSIM "fake nets" (networks_basic.py:123-187 semantics).
  * 2AFC and JND dataset scoring (dist_model.py:212-284 semantics).

Inputs are NHWC in [-1, 1]. Backbone + head weights port from the published
.pth files via hrviton_tpu.train.checkpoint; random init is the test fallback.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.models.backbones import (AlexNetFeatures, SqueezeNetFeatures,
                                          Vgg16Features)
from hrviton_tpu.nn.layers import Conv2d, kaiming_normal_init

__all__ = ["LPIPSModel", "LPIPSAlex", "LPIPSFn", "make_lpips",
           "l2_distance", "dssim_distance", "score_2afc", "score_jnd"]

# networks_basic.py:94-102 ScalingLayer constants
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)

_BACKBONES = {
    "alex": (AlexNetFeatures, 5),
    "vgg16": (Vgg16Features, 5),
    "squeeze": (SqueezeNetFeatures, 7),
}


def _normalize_tensor(x, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPSModel(nn.Module):
    """net-lin (lpips=True) or net (lpips=False) distance model."""

    net: str = "alex"
    lpips: bool = True          # learned linear heads vs uniform averaging
    spatial: bool = False       # return per-pixel maps instead of averages

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        # train=True enables the NetLinLayer dropout the reference trains the
        # heads under (networks_basic.py:104-112, use_dropout=True); scoring
        # callers never pass it, so eval behavior is unchanged.
        backbone_cls, n_taps = _BACKBONES[self.net]

        def scaled(v):
            return (v.astype(jnp.float32) - _SHIFT) / _SCALE

        backbone = backbone_cls(name=self.net if self.net != "vgg16" else "vgg16")
        fx = backbone(scaled(x))
        fy = backbone(scaled(y))
        total = 0.0
        for i in range(n_taps):
            dx = _normalize_tensor(fx[i].astype(jnp.float32))
            dy = _normalize_tensor(fy[i].astype(jnp.float32))
            diff = (dx - dy) ** 2
            if self.lpips:
                if train:
                    diff = nn.Dropout(0.5, deterministic=False)(diff)
                d = Conv2d(1, 1, use_bias=False,
                           kernel_init=kaiming_normal_init(),
                           name=f"lin{i}")(diff)
            else:
                d = jnp.sum(diff, axis=-1, keepdims=True)
            if self.spatial:
                from hrviton_tpu.ops.resize import interpolate
                total = total + interpolate(d, size=x.shape[1:3],
                                            mode="bilinear")
            else:
                total = total + jnp.mean(d, axis=(1, 2))
        if self.spatial:
            return total[..., 0]
        return total[..., 0]  # (N,)


class LPIPSAlex(LPIPSModel):
    """Back-compat alias: net-lin alex, the configuration the reference uses
    everywhere (train_generator.py:651, evaluate.py:41)."""

    net: str = "alex"

    @nn.compact
    def __call__(self, x, y):
        # keep the original parameter naming ('alexnet' backbone scope)
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
            total = total + jnp.mean(lin, axis=(1, 2))
        return total[..., 0]


class LPIPSFn:
    """Callable LPIPS closed over frozen variables."""

    def __init__(self, variables, model=None):
        self._model = model if model is not None else LPIPSAlex()
        self.variables = variables

    def __call__(self, x, y):
        return self._model.apply(self.variables, x, y)


def make_lpips(variables=None, rng=None, image_hw=(128, 128)) -> LPIPSFn:
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z = jnp.zeros((1, *image_hw, 3), jnp.float32)
        variables = LPIPSAlex().init(rng, z, z)
    return LPIPSFn(variables)


# ------------------------------------------------------- fake-net distances

def l2_distance(x, y):
    """Mean squared difference on [-1,1] images scaled to [0,1]
    (networks_basic.py L2 semantics: mean over CHW of ((a-b)/2)^2)."""
    d = ((x.astype(jnp.float32) - y.astype(jnp.float32)) / 2.0) ** 2
    return jnp.mean(d, axis=tuple(range(1, d.ndim)))


def dssim_distance(x, y):
    """(1 - SSIM) / 2, skimage-default-exact (networks_basic.py:167-174 →
    eval_models/__init__.py:52-53: compare_ssim(multichannel=True,
    data_range=255) on tensor2im uint8 images).

    skimage defaults: 7x7 uniform window, sample covariance (N/(N-1)),
    border crop of (win-1)/2 — the crop makes a VALID conv exact (the cropped
    region of the reflect-padded 'same' filter never sees padding). Inputs are
    [-1,1] images; tensor2im's uint8 cast truncates toward zero."""
    # tensor2im (eval_models/__init__.py:106-112): (img+1)*127.5 astype(uint8)
    a = jnp.clip(jnp.floor((x.astype(jnp.float32) + 1.0) * 127.5), 0.0, 255.0)
    b = jnp.clip(jnp.floor((y.astype(jnp.float32) + 1.0) * 127.5), 0.0, 255.0)
    k = 7
    c = a.shape[-1]
    win = jnp.full((k, k, 1, 1), 1.0 / (k * k), jnp.float32)
    win = jnp.broadcast_to(win, (k, k, 1, c))
    dn = jax.lax.conv_dimension_numbers(a.shape, win.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def filt(v):
        return jax.lax.conv_general_dilated(v, win, (1, 1), "VALID",
                                            dimension_numbers=dn,
                                            feature_group_count=c)

    cov_norm = (k * k) / (k * k - 1.0)  # use_sample_covariance=True
    mu_a, mu_b = filt(a), filt(b)
    var_a = cov_norm * (filt(a * a) - mu_a ** 2)
    var_b = cov_norm * (filt(b * b) - mu_b ** 2)
    cov = cov_norm * (filt(a * b) - mu_a * mu_b)
    data_range = 255.0
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / \
        ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    # per-channel mean then channel average == mean over the map
    ssim = jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))
    return (1.0 - ssim) / 2.0


# --------------------------------------------------------- dataset scoring

def score_2afc(d0s: np.ndarray, d1s: np.ndarray, gts: np.ndarray) -> float:
    """Two-alternative forced choice score (dist_model.py:212-244):
    fraction of human judgements agreeing with the metric's ordering."""
    d0s, d1s, gts = map(np.asarray, (d0s, d1s, gts))
    scores = (d0s < d1s) * (1.0 - gts) + (d1s < d0s) * gts + (d1s == d0s) * 0.5
    return float(np.mean(scores))


def score_jnd(ds: np.ndarray, sames: np.ndarray) -> float:
    """JND score: area under the precision-recall curve of 'same' detection
    sorted by distance (dist_model.py:247-284 semantics)."""
    ds, sames = np.asarray(ds), np.asarray(sames)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1 - sames_sorted)
    fns = np.sum(sames_sorted) - tps
    precision = tps / np.maximum(tps + fps, 1e-12)
    recall = tps / np.maximum(tps + fns, 1e-12)
    # trapezoid AUC over recall
    rec = np.concatenate([[0.0], recall])
    prec = np.concatenate([[1.0], precision])
    return float(np.sum((rec[1:] - rec[:-1]) * prec[1:]))
