"""Pretrained-CNN feature backbones for perceptual losses.

  * Vgg19Features — the 5-slice VGG19 extractor of VGGLoss
    (/root/reference/networks.py:201-231): taps relu1_1, relu2_1, relu3_1,
    relu4_1, relu5_1.
  * AlexNetFeatures — the 5-slice AlexNet extractor used by LPIPS
    (/root/reference/eval_models/pretrained_networks.py:6-55).

Weights are ported from torchvision checkpoints with
hrviton_tpu.train.checkpoint.convert_torch_* (torch-CPU is available in the
image); random init is a functional fallback for tests.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from hrviton_tpu.nn.layers import Conv2d, kaiming_normal_init


def _maxpool(x, k=2, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _maxpool3(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class Vgg19Features(nn.Module):
    """VGG19 through conv5_1; returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1]."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        init = kaiming_normal_init()

        def conv(feats, name):
            return Conv2d(feats, 3, padding=1, kernel_init=init, name=name)

        taps = []
        h = nn.relu(conv(64, "conv1_1")(x)); taps.append(h)
        h = nn.relu(conv(64, "conv1_2")(h)); h = _maxpool(h)
        h = nn.relu(conv(128, "conv2_1")(h)); taps.append(h)
        h = nn.relu(conv(128, "conv2_2")(h)); h = _maxpool(h)
        h = nn.relu(conv(256, "conv3_1")(h)); taps.append(h)
        h = nn.relu(conv(256, "conv3_2")(h))
        h = nn.relu(conv(256, "conv3_3")(h))
        h = nn.relu(conv(256, "conv3_4")(h)); h = _maxpool(h)
        h = nn.relu(conv(512, "conv4_1")(h)); taps.append(h)
        h = nn.relu(conv(512, "conv4_2")(h))
        h = nn.relu(conv(512, "conv4_3")(h))
        h = nn.relu(conv(512, "conv4_4")(h)); h = _maxpool(h)
        h = nn.relu(conv(512, "conv5_1")(h)); taps.append(h)
        return taps


class Vgg16Features(nn.Module):
    """VGG16 with the LPIPS slicing (pretrained_networks.py:139-180):
    taps relu1_2, relu2_2, relu3_3, relu4_3, relu5_3."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        init = kaiming_normal_init()

        def conv(feats, name):
            return Conv2d(feats, 3, padding=1, kernel_init=init, name=name)

        taps = []
        h = nn.relu(conv(64, "conv1_1")(x))
        h = nn.relu(conv(64, "conv1_2")(h)); taps.append(h)
        h = _maxpool(h)
        h = nn.relu(conv(128, "conv2_1")(h))
        h = nn.relu(conv(128, "conv2_2")(h)); taps.append(h)
        h = _maxpool(h)
        h = nn.relu(conv(256, "conv3_1")(h))
        h = nn.relu(conv(256, "conv3_2")(h))
        h = nn.relu(conv(256, "conv3_3")(h)); taps.append(h)
        h = _maxpool(h)
        h = nn.relu(conv(512, "conv4_1")(h))
        h = nn.relu(conv(512, "conv4_2")(h))
        h = nn.relu(conv(512, "conv4_3")(h)); taps.append(h)
        h = _maxpool(h)
        h = nn.relu(conv(512, "conv5_1")(h))
        h = nn.relu(conv(512, "conv5_2")(h))
        h = nn.relu(conv(512, "conv5_3")(h)); taps.append(h)
        return taps


class _Fire(nn.Module):
    squeeze: int
    expand1: int
    expand3: int

    @nn.compact
    def __call__(self, x):
        init = kaiming_normal_init()
        s = nn.relu(Conv2d(self.squeeze, 1, kernel_init=init, name="squeeze")(x))
        e1 = nn.relu(Conv2d(self.expand1, 1, kernel_init=init,
                            name="expand1x1")(s))
        e3 = nn.relu(Conv2d(self.expand3, 3, padding=1, kernel_init=init,
                            name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet 1.1 with the LPIPS 7-tap slicing
    (pretrained_networks.py:6-55)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        init = kaiming_normal_init()
        taps = []
        h = nn.relu(Conv2d(64, 3, stride=2, kernel_init=init, name="conv1")(x))
        taps.append(h)
        h = _maxpool3(h)
        h = _Fire(16, 64, 64, name="fire2")(h)
        h = _Fire(16, 64, 64, name="fire3")(h); taps.append(h)
        h = _maxpool3(h)
        h = _Fire(32, 128, 128, name="fire4")(h)
        h = _Fire(32, 128, 128, name="fire5")(h); taps.append(h)
        h = _maxpool3(h)
        h = _Fire(48, 192, 192, name="fire6")(h); taps.append(h)
        h = _Fire(48, 192, 192, name="fire7")(h); taps.append(h)
        h = _Fire(64, 256, 256, name="fire8")(h); taps.append(h)
        h = _Fire(64, 256, 256, name="fire9")(h); taps.append(h)
        return taps


class AlexNetFeatures(nn.Module):
    """AlexNet features; returns [relu1..relu5] per the LPIPS slicing
    (pretrained_networks.py:18-33)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        init = kaiming_normal_init()
        taps = []
        h = Conv2d(64, 11, stride=4, padding=2, kernel_init=init, name="conv1")(x)
        h = nn.relu(h); taps.append(h)
        h = _maxpool3(h)
        h = Conv2d(192, 5, padding=2, kernel_init=init, name="conv2")(h)
        h = nn.relu(h); taps.append(h)
        h = _maxpool3(h)
        h = Conv2d(384, 3, padding=1, kernel_init=init, name="conv3")(h)
        h = nn.relu(h); taps.append(h)
        h = Conv2d(256, 3, padding=1, kernel_init=init, name="conv4")(h)
        h = nn.relu(h); taps.append(h)
        h = Conv2d(256, 3, padding=1, kernel_init=init, name="conv5")(h)
        h = nn.relu(h); taps.append(h)
        return taps
