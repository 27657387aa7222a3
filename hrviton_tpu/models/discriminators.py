"""Multiscale PatchGAN discriminators — both HR-VITON flavors.

  * CondMultiscaleDiscriminator: pix2pixHD-style, judges (input1, input2,
    segmap_softmax) for the condition stage
    (/root/reference/networks.py:302-408, define_D at :445-453).
  * SPADEMultiscaleDiscriminator: SPADE-style, judges (parse, image) with
    intermediate features exposed for feature matching
    (/root/reference/network_generator.py:250-316).

Both operate on NHWC and return list-of-list outputs matching the reference's
shape contract so the GAN/feature-matching losses can be shared.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from hrviton_tpu.config import CondDiscriminatorConfig, SPADEDiscriminatorConfig
from hrviton_tpu.nn.layers import (Conv2d, InstanceNorm2d, BatchNorm2d,
                                   SpectralNorm2d, leaky_relu, normal_init,
                                   xavier_normal_init)

_PADW = 2  # int(ceil((4 - 1) / 2)) — torch kw=4 padding (networks.py:358-359)


class CondNLayerDiscriminator(nn.Module):
    """NLayerDiscriminator (/root/reference/networks.py:351-408)."""

    cfg: CondDiscriminatorConfig

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = False):
        cfg = self.cfg
        init = normal_init(0.02)  # weights_init applied by define_D (networks.py:452)

        def norm(nc, name):
            if cfg.norm == "instance":
                return lambda h: InstanceNorm2d(name=name)(h)
            return lambda h: BatchNorm2d(nc, name=name)(h, use_running_average=not train)

        def sconv(feats, stride, name):
            if cfg.spectral:
                return lambda h: SpectralNorm2d(
                    feats, 4, stride=stride, padding=_PADW, kernel_init=init,
                    name=name)(h, update_stats=update_sn)
            return lambda h: Conv2d(feats, 4, stride=stride, padding=_PADW,
                                    kernel_init=init, name=name)(h)

        feats: List = []
        h = Conv2d(cfg.ndf, 4, stride=2, padding=_PADW, kernel_init=init,
                   name="layer0_conv")(x)
        h = leaky_relu(h)
        feats.append(h)

        nf = cfg.ndf
        for n in range(1, cfg.n_layers):
            nf = min(nf * 2, 512)
            h = sconv(nf, 2, f"layer{n}_conv")(h)
            h = norm(nf, f"layer{n}_norm")(h)
            h = leaky_relu(h)
            if cfg.ddropout:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            feats.append(h)

        nf = min(nf * 2, 512)
        h = Conv2d(nf, 4, stride=1, padding=_PADW, kernel_init=init,
                   name=f"layer{cfg.n_layers}_conv")(h)
        h = norm(nf, f"layer{cfg.n_layers}_norm")(h)
        h = leaky_relu(h)
        feats.append(h)

        h = Conv2d(1, 4, stride=1, padding=_PADW, kernel_init=init,
                   name=f"layer{cfg.n_layers + 1}_conv")(h)
        if cfg.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)

        return feats if cfg.get_interm_feat else [h]


def _avg_downsample(x):
    """AvgPool2d(3, 2, pad=1, count_include_pad=False) (networks.py:320)."""
    from hrviton_tpu.ops.pool import avg_pool2d_nopad
    return avg_pool2d_nopad(x, 3, 2, 1)


class CondMultiscaleDiscriminator(nn.Module):
    """MultiscaleDiscriminator (/root/reference/networks.py:302-349).

    Scale ordering parity: sub-discriminator index num_D-1-i consumes the input
    downsampled i times (networks.py:339-348).
    """

    cfg: CondDiscriminatorConfig

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = False):
        cfg = self.cfg
        subs = [CondNLayerDiscriminator(cfg, name=f"discriminator_{i}")
                for i in range(cfg.num_d)]
        h = _avg_downsample(x) if cfg.ddownx2 else x
        result = []
        for i in range(cfg.num_d):
            result.append(subs[cfg.num_d - 1 - i](h, train=train, update_sn=update_sn))
            if i != cfg.num_d - 1:
                h = _avg_downsample(h)
        return result


class SPADENLayerDiscriminator(nn.Module):
    """NLayerDiscriminator (/root/reference/network_generator.py:250-288).

    Middle convs are spectral-normalized and lose their bias (the reference's
    get_nonspade_norm_layer deletes it, network_generator.py:416-420); instance
    norm is affine-free.
    """

    cfg: SPADEDiscriminatorConfig

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = False):
        cfg = self.cfg
        init = xavier_normal_init(0.02)
        results = []
        h = Conv2d(cfg.ndf, 4, stride=2, padding=_PADW, kernel_init=init,
                   name="layer0_conv")(x)
        h = leaky_relu(h)
        results.append(h)

        nf = cfg.ndf
        for n in range(1, cfg.n_layers_d):
            nf = min(nf * 2, 512)
            h = SpectralNorm2d(nf, 4, stride=2, padding=_PADW, use_bias=False,
                               kernel_init=init, name=f"layer{n}_conv")(
                h, update_stats=update_sn)
            h = InstanceNorm2d(name=f"layer{n}_norm")(h)
            h = leaky_relu(h)
            results.append(h)

        h = Conv2d(1, 4, stride=1, padding=_PADW, kernel_init=init,
                   name=f"layer{cfg.n_layers_d}_conv")(h)
        results.append(h)

        return results if not cfg.no_gan_feat_loss else h


class SPADEMultiscaleDiscriminator(nn.Module):
    """MultiscaleDiscriminator (/root/reference/network_generator.py:291-316).

    Scale ordering parity: discriminator_0 sees full resolution, each next one a
    further avg-pool downsample."""

    cfg: SPADEDiscriminatorConfig

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = False):
        cfg = self.cfg
        result = []
        h = x
        for i in range(cfg.num_d):
            out = SPADENLayerDiscriminator(cfg, name=f"discriminator_{i}")(
                h, train=train, update_sn=update_sn)
            if cfg.no_gan_feat_loss:
                out = [out]
            result.append(out)
            h = _avg_downsample(h)
        return result
