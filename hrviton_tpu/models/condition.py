"""Try-On Condition Generator (tocg) — joint appearance-flow + segmentation net.

TPU-native re-design of ``ConditionGenerator`` (/root/reference/networks.py:13-159):
NHWC layout, functional Flax modules, unrolled static 5-level pyramid (shapes are
known at trace time so the whole coarse-to-fine loop compiles to one XLA program),
grid-sample warps via hrviton_tpu.ops.grid_sample.

Forward contract (parity with networks.py:98-159):
  inputs  input1 (N,256,192,4)=cloth+mask, input2 (N,256,192,16)=parse_agn+densepose
  returns (flow_list[5], segmap(N,256,192,13), warped_cloth(N,256,192,3),
           warped_cloth_mask(N,256,192,1))
  flow_list[i] has shape (N, 8*2^i, 6*2^i, 2) in pixel units of its level.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hrviton_tpu.config import TOCGConfig
from hrviton_tpu.nn.layers import BatchNorm2d, Conv2d, InstanceNorm2d, normal_init
from hrviton_tpu.ops.grid_sample import grid_sample, make_grid
from hrviton_tpu.ops.resize import interpolate, resize_flow

# Parity with weights_init (/root/reference/networks.py:428-434): conv ~ N(0,.02),
# BN scale ~ N(1,.02), BN bias 0 — note the reference only *applies* it to the
# discriminator (define_D:452); the generator keeps torch's default kaiming-
# uniform. We use N(0,.02) for all condition-stage convs: simpler, and trained
# checkpoints overwrite inits anyway.
_conv_init = normal_init(0.02)


class ResBlock(nn.Module):
    """ResBlock (/root/reference/networks.py:171-198): scale conv + 2x(conv-norm)."""

    out_nc: int
    scale: str = "down"        # 'down' | 'up' | 'same'
    norm: str = "batch"

    def _norm(self, name):
        if self.norm == "batch":
            return BatchNorm2d(self.out_nc, scale_init=nn.initializers.ones, name=name)
        return InstanceNorm2d(name=name)

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_bias = self.norm == "instance"
        if self.scale == "same":
            residual = Conv2d(self.out_nc, 1, use_bias=True,
                              kernel_init=_conv_init, name="scale_conv")(x)
        elif self.scale == "up":
            up = interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
            residual = Conv2d(self.out_nc, 1, use_bias=True,
                              kernel_init=_conv_init, name="scale_conv")(up)
        elif self.scale == "down":
            residual = Conv2d(self.out_nc, 3, stride=2, padding=1, use_bias=use_bias,
                              kernel_init=_conv_init, name="scale_conv")(x)
        else:
            raise ValueError(f"bad scale {self.scale!r}")

        y = Conv2d(self.out_nc, 3, padding=1, use_bias=use_bias,
                   kernel_init=_conv_init, name="conv1")(residual)
        y = self._norm("norm1")(y, use_running_average=not train) \
            if self.norm == "batch" else self._norm("norm1")(y)
        y = nn.relu(y)
        y = Conv2d(self.out_nc, 3, padding=1, use_bias=use_bias,
                   kernel_init=_conv_init, name="conv2")(y)
        y = self._norm("norm2")(y, use_running_average=not train) \
            if self.norm == "batch" else self._norm("norm2")(y)
        return nn.relu(residual + y)


class ConditionGenerator(nn.Module):
    cfg: TOCGConfig = TOCGConfig()

    @nn.compact
    def __call__(self, input1, input2, train: bool = True):
        cfg = self.cfg
        ngf = cfg.ngf
        up_mode = cfg.upsample

        # --- twin feature-pyramid encoders (networks.py:19-33) ---
        enc_dims = [ngf, ngf * 2, ngf * 4, ngf * 4, ngf * 4]
        e1_list, e2_list = [], []
        h1, h2 = input1, input2
        for i, d in enumerate(enc_dims):
            h1 = ResBlock(d, scale="down", norm=cfg.norm,
                          name=f"ClothEncoder_{i}")(h1, train)
            h2 = ResBlock(d, scale="down", norm=cfg.norm,
                          name=f"PoseEncoder_{i}")(h2, train)
            e1_list.append(h1)
            e2_list.append(h2)

        # --- coarse-to-fine flow + segmentation decoding (networks.py:113-144) ---
        seg_dims = [ngf * 4, ngf * 4, ngf * 2, ngf, ngf]
        bott_dims = [ngf * 4] * 4
        flow_list = []
        t1 = t2 = x = None
        flow = None
        for i in range(5):
            feat1 = e1_list[4 - i]
            feat2 = e2_list[4 - i]
            n, ih, iw, _ = feat1.shape
            grid = make_grid(n, ih, iw)

            if i == 0:
                t1, t2 = feat1, feat2
                e4 = jnp.concatenate([t1, t2], axis=-1)
                flow = Conv2d(2, 3, padding=1, kernel_init=_conv_init,
                              name="flow_conv_0")(e4)
                flow_list.append(flow)
                x = ResBlock(ngf * 8, scale="same", norm=cfg.norm,
                             name="conv")(t2, train)
                x = ResBlock(seg_dims[0], scale="up", norm=cfg.norm,
                             name="SegDecoder_0")(x, train)
            else:
                # lateral 1x1 convs conv1/conv2[4-i] (networks.py:64-77,130-131)
                t1 = interpolate(t1, scale_factor=2, mode=up_mode) + \
                    Conv2d(ngf * 4, 1, use_bias=True, kernel_init=_conv_init,
                           name=f"conv1_{4 - i}")(feat1)
                t2 = interpolate(t2, scale_factor=2, mode=up_mode) + \
                    Conv2d(ngf * 4, 1, use_bias=True, kernel_init=_conv_init,
                           name=f"conv2_{4 - i}")(feat2)

                flow_up = resize_flow(flow_list[i - 1], (ih, iw), mode=up_mode)
                # normalization by the *previous* level's half-extent
                # (networks.py:134: iW/2 - 1 where iW is current level width)
                fn = jnp.stack([
                    flow_up[..., 0] / ((iw / 2 - 1.0) / 2.0),
                    flow_up[..., 1] / ((ih / 2 - 1.0) / 2.0),
                ], axis=-1)
                warped_t1 = grid_sample(t1, fn + grid, padding_mode="border")

                bott = Conv2d(bott_dims[i - 1], 3, padding=1, use_bias=True,
                              kernel_init=_conv_init, name=f"bottleneck_{i - 1}")(x)
                bott = nn.relu(bott)
                delta = Conv2d(2, 3, padding=1, kernel_init=_conv_init,
                               name=f"flow_conv_{i}")(
                    jnp.concatenate([warped_t1, bott], axis=-1))
                flow = flow_up + delta
                flow_list.append(flow)

                if cfg.warp_feature == "T1":
                    dec_in = jnp.concatenate([x, feat2, warped_t1], axis=-1)
                elif cfg.warp_feature == "encoder":
                    warped_e1 = grid_sample(feat1, fn + grid, padding_mode="border")
                    dec_in = jnp.concatenate([x, feat2, warped_e1], axis=-1)
                else:
                    raise ValueError(cfg.warp_feature)
                x = ResBlock(seg_dims[i], scale="up", norm=cfg.norm,
                             name=f"SegDecoder_{i}")(dec_in, train)

        # --- full-resolution warp + segmentation head (networks.py:147-158) ---
        n, ih, iw, _ = input1.shape
        grid = make_grid(n, ih, iw)
        flow_full = resize_flow(flow_list[-1], (ih, iw), mode=up_mode)
        fn = jnp.stack([
            flow_full[..., 0] / ((iw / 2 - 1.0) / 2.0),
            flow_full[..., 1] / ((ih / 2 - 1.0) / 2.0),
        ], axis=-1)
        warped_input1 = grid_sample(input1, fn + grid, padding_mode="border")

        head_in = jnp.concatenate([x, input2, warped_input1], axis=-1)
        if cfg.out_layer == "relu":
            seg = ResBlock(cfg.output_nc, scale="same", norm=cfg.norm,
                           name="out_layer")(head_in, train)
        elif cfg.out_layer == "conv":
            seg = ResBlock(ngf, scale="same", norm=cfg.norm,
                           name="out_layer_res")(head_in, train)
            seg = Conv2d(cfg.output_nc, 1, use_bias=True, kernel_init=_conv_init,
                         name="out_layer_conv")(seg)
        else:
            raise ValueError(cfg.out_layer)

        warped_c = warped_input1[..., :-1]
        warped_cm = warped_input1[..., -1:]
        return flow_list, seg, warped_c, warped_cm
