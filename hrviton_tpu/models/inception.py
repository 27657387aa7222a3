"""InceptionV3 classifier for the Inception Score metric.

The reference computes IS with ``torchvision.models.inception_v3(pretrained=
True, transform_input=False)`` at 299x299 (/root/reference/evaluate.py:43,75-76).
This is a Flax NHWC reimplementation with module names mirroring the
torchvision state_dict so ``convert_inception_v3`` can port the weights
(torchvision is not installed in this image; users supply the .pth).

BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3) + relu, exactly as
torchvision; aux classifier omitted (unused at eval).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.nn.layers import BatchNorm2d, Conv2d, kaiming_normal_init
from hrviton_tpu.ops.pool import avg_pool2d_nopad

__all__ = ["InceptionV3", "convert_inception_v3"]


class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=False,
                   kernel_init=kaiming_normal_init(), name="conv")(x)
        x = BatchNorm2d(self.features, eps=1e-3, name="bn")(
            x, use_running_average=True)
        return nn.relu(x)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3s1(x):
    # torch F.avg_pool2d(x, 3, stride=1, padding=1) default includes pad zeros
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    return (s / 9.0).astype(x.dtype)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avgpool3s1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3s1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _avgpool3s1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Eval-mode inception_v3 (transform_input=False); input NHWC 299x299 in
    [-1, 1] (the reference feeds Normalize(0.5,0.5) tensors); returns logits."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def convert_inception_v3(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state_dict -> InceptionV3 variables."""
    params: Dict = {}
    stats: Dict = {}

    def setp(root, path, v):
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(v)

    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in sd if k.endswith(".conv.weight")})
    for pre in prefixes:
        if pre.startswith("AuxLogits"):
            continue
        path = tuple(pre.split("."))
        setp(params, (*path, "conv", "conv", "kernel"),
             sd[pre + ".conv.weight"].transpose(2, 3, 1, 0))
        setp(params, (*path, "bn", "scale"), sd[pre + ".bn.weight"])
        setp(params, (*path, "bn", "bias"), sd[pre + ".bn.bias"])
        setp(stats, (*path, "bn", "mean"), sd[pre + ".bn.running_mean"])
        setp(stats, (*path, "bn", "var"), sd[pre + ".bn.running_var"])

    setp(params, ("fc", "kernel"), sd["fc.weight"].T)
    setp(params, ("fc", "bias"), sd["fc.bias"])
    return {"params": params, "batch_stats": stats}
