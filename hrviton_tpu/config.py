"""Typed configuration for models, pipelines and training.

Replaces the reference's per-script argparse sprawl (~30-40 duplicated flags per
CLI, /root/reference/train_condition.py:45-110, train_generator.py:33-128,
test_generator.py:25-75) with frozen dataclasses. The CLI layer
(hrviton_tpu/cli) re-exposes the original flag names for drop-in parity.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class TOCGConfig:
    """Try-on condition generator (/root/reference/networks.py:13-159)."""
    input1_nc: int = 4            # cloth RGB + cloth mask
    input2_nc: int = 16           # 13-ch parse-agnostic + 3-ch densepose
    output_nc: int = 13           # segmentation classes
    ngf: int = 96                 # call-site value (train_condition.py:481)
    warp_feature: str = "T1"      # 'T1' | 'encoder'  (networks.py:37-54)
    out_layer: str = "relu"       # 'relu' | 'conv'   (networks.py:55-61)
    norm: str = "batch"           # encoder/decoder norm layer
    upsample: str = "bilinear"    # pyramid upsample mode


@dataclass(frozen=True)
class SPADEGenConfig:
    """SPADE image generator (/root/reference/network_generator.py:176-245)."""
    input_nc: int = 9             # agnostic(3) + densepose(3) + warped cloth(3)
    ngf: int = 64
    gen_semantic_nc: int = 7
    num_upsampling_layers: str = "most"   # 'more' | 'most' ('normal' is broken
                                          # in the reference: G_middle_1 channel
                                          # mismatch, network_generator.py:230)
    norm_g: str = "spectralaliasinstance"
    fine_height: int = 1024
    fine_width: int = 768
    remat: bool = True            # rematerialize SPADE blocks in backward
                                  # (full-res training needs it to fit HBM)
    s2d_tail: bool = False        # run the full-res tail (up_3/up_4/conv_img)
                                  # in the space-to-depth domain (ops/s2d.py):
                                  # exact math, 128-lane-aligned channels.
                                  # 'most' only; ignored otherwise.
    fused_block: bool = True      # fuse each SPADE block's {norm -> act ->
                                  # conv} pairs into software-pipelined
                                  # Pallas passes (ops/spade_block.py) at
                                  # eligible scales (TPU, bf16, >=256 rows).
                                  # Exact math, identical param tree/RNG,
                                  # differentiable (custom VJP); 17.2 ->
                                  # 18.6 img/s composed inference (r4).
                                  # TRAINING should turn this OFF (the unit
                                  # VJP re-runs an isolated XLA forward per
                                  # unit: +50 ms/step at b2 1024x768, r5;
                                  # cli/train_generator.py defaults it off).
    # Measured-dead-end experiment knobs, owned here so no hidden trace-time
    # state decides the compiled graph (context managers in ops/ remain for
    # A/B scripts). All exact-math; all measured SLOWER composed (ROADMAP §1):
    fast_conv: bool = False       # Pallas 3x3 convs (ops/conv3x3.py) — wins
                                  # isolated, loses block fusion
    fast_spade: bool = False      # fused SPADE-norm Pallas kernel
                                  # (ops/spade_fused.py) — 15.7 vs 17.2 img/s
    merge_gamma_beta: bool = False  # one 2C-out modulation conv per norm —
                                  # 16.1 vs 17.1 img/s composed

    @property
    def num_up_layers(self) -> int:
        return {"normal": 5, "more": 6, "most": 7}[self.num_upsampling_layers]

    @property
    def latent_hw(self) -> Tuple[int, int]:
        f = 2 ** self.num_up_layers
        return self.fine_height // f, self.fine_width // f


@dataclass(frozen=True)
class CondDiscriminatorConfig:
    """pix2pixHD-style multiscale PatchGAN for the condition stage
    (/root/reference/networks.py:302-408, define_D at :445)."""
    input_nc: int = 33            # input1(4) + input2(16) + segmap(13)
    ndf: int = 64
    n_layers: int = 3
    num_d: int = 2
    norm: str = "instance"
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    ddownx2: bool = False
    ddropout: bool = False
    spectral: bool = False


@dataclass(frozen=True)
class SPADEDiscriminatorConfig:
    """SPADE-style multiscale discriminator
    (/root/reference/network_generator.py:250-316)."""
    gen_semantic_nc: int = 7
    ndf: int = 64
    n_layers_d: int = 3
    num_d: int = 2
    norm_d: str = "spectralinstance"
    no_gan_feat_loss: bool = False

    @property
    def input_nc(self) -> int:
        return self.gen_semantic_nc + 3


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end try-on pipeline (test_generator.py path, SURVEY.md §3.1)."""
    fine_height: int = 1024
    fine_width: int = 768
    cond_height: int = 256
    cond_width: int = 192
    semantic_nc: int = 13
    clothmask_composition: str = "warp_grad"  # 'no_composition'|'detach'|'warp_grad'
    occlusion: bool = False
    upsample: str = "bilinear"
    # Normalization constants for upsampling the 256x192 flow to full res use the
    # *condition-stage* grid size (96, 128) (test_generator.py:208).
    flow_norm_w: float = (96 - 1.0) / 2.0
    flow_norm_h: float = (128 - 1.0) / 2.0


@dataclass(frozen=True)
class ConditionTrainConfig:
    """Stage-1 loop hyperparameters (/root/reference/train_condition.py)."""
    batch_size: int = 8
    keep_step: int = 300000
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    ce_lambda: float = 10.0
    gan_lambda: float = 1.0
    tv_lambda: float = 2.0
    l1_lambda: float = 10.0
    no_gan_loss: bool = False
    g_d_separate: bool = False
    lasttvonly: bool = False
    interflowloss: bool = False
    edgeawaretv: str = "no_edge"  # 'no_edge' | 'last_only' | 'weighted'
    add_lasttv: bool = False
    occlusion: bool = False
    clothmask_composition: str = "warp_grad"
    val_count: int = 1000
    display_count: int = 100
    save_count: int = 10000
    tensorboard_count: int = 100
    load_step: int = 0
    bf16: bool = False            # compute-in-bf16 / params-in-f32


@dataclass(frozen=True)
class GeneratorTrainConfig:
    """Stage-2 loop hyperparameters (/root/reference/train_generator.py)."""
    batch_size: int = 4
    keep_step: int = 100000
    decay_step: int = 100000
    g_lr: float = 1e-4
    d_lr: float = 4e-4            # TTUR (train_generator.py:73-74)
    beta1: float = 0.0
    beta2: float = 0.9
    lambda_feat: float = 10.0
    lambda_vgg: float = 10.0
    no_gan_feat_loss: bool = False
    no_vgg_loss: bool = False
    gt_mode: bool = False         # --GT: condition on ground-truth parse
    occlusion: bool = False
    clothmask_composition: str = "warp_grad"
    lpips_count: int = 1000
    display_count: int = 100
    save_count: int = 10000
    tensorboard_count: int = 100
    load_step: int = 0
    bf16: bool = False            # compute-in-bf16 / params-in-f32
                                  # (replaces apex AMP O1; no loss scaling)
    taps_wgrad: bool = True       # im2col-free 3x3 conv weight gradients
                                  # (scan-chunked tap matmuls) — cuts the
                                  # ~1.1 GB/conv wgrad temps at full res so
                                  # larger per-chip batches fit HBM. Exactly
                                  # equivalent numerically (tests/
                                  # test_round2_fixes.py) and never slower;
                                  # default ON since round 3
    d_remat: bool = True          # jax.checkpoint the D forward (recompute its
                                  # activations in backward). Required to fit
                                  # 16G HBM at full res; off shrinks compile
                                  # time for tiny-shape dryruns/tests
    split_d_batch: bool = False   # run D on fake/real separately instead of
                                  # the reference's cat(fake, real): identical
                                  # math for the instance-norm D (per-sample
                                  # stats; spectral sigma derives from the same
                                  # stored u either way) but halves the D's
                                  # peak activation memory — lets larger
                                  # per-chip batches fit 16G HBM


@dataclass(frozen=True)
class DataConfig:
    """VITON-HD dataset layout (cp_dataset.py contract, SURVEY.md §3.4)."""
    dataroot: str = "./data/zalando-hd-resize"
    datamode: str = "train"
    data_list: str = "train_pairs.txt"
    fine_height: int = 256
    fine_width: int = 192
    semantic_nc: int = 13
    shuffle: bool = True
    workers: int = 4


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh: 'data' for batch sharding, 'model' reserved (SURVEY.md §2.2)."""
    data_axis: int = -1          # -1: all devices on the data axis
    model_axis: int = 1


@dataclass(frozen=True)
class PrecisionConfig:
    """bf16 compute / f32 params policy (replaces apex AMP O1,
    train_generator.py:161-169; no loss scaling needed on TPU)."""
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @property
    def enabled(self) -> bool:
        return self.compute_dtype != "float32"


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
