"""End-to-end try-on pipeline — the reference's #1 entry point, fully jitted.

Implements the canonical inference call stack (SURVEY.md §3.1,
/root/reference/test_generator.py:90-238) as one pure function:

  downsample -> tocg -> cloth-mask composition -> gaussian blur + argmax ->
  13->7 regroup -> full-res flow warp -> occlusion removal -> SPADE generator

Everything is static-shaped jnp, so the whole pipeline compiles to a single XLA
program per (batch, resolution); the two-resolution design (condition stage at
256x192, rendering at 1024x768) is preserved.

The conditioning sub-pipeline is shared verbatim by stage-2 training
(/root/reference/train_generator.py:201-275) and the condition test CLI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hrviton_tpu.config import PipelineConfig
from hrviton_tpu.ops.blur import gaussian_blur
from hrviton_tpu.ops.grid_sample import grid_sample, make_grid
from hrviton_tpu.ops.parse import group_index_of_label13, lut_lookup
from hrviton_tpu.ops.resize import interpolate, resize_flow


class ConditionOutputs(NamedTuple):
    flow_list: Any
    fake_segmap: jax.Array        # composed 13-ch logits at condition res
    warped_cloth_lr: jax.Array    # tocg's own full-warp at condition res
    warped_clothmask_lr: jax.Array
    fake_parse_gauss: jax.Array   # blurred 13-ch logits at fine res
    fake_parse: jax.Array         # argmax labels (N, H, W)
    parse7: jax.Array             # 7-ch SPADE conditioning map at fine res
    parse_labels: jax.Array       # 7-way int labels (N, H, W) — the compact
                                  # form parse7 one-hots; SPADEGenerator takes
                                  # it directly (bit-identical, fusion-friendly)
    warped_cloth: jax.Array       # full-res warped cloth (after occlusion if on)
    warped_clothmask: jax.Array


def compose_clothmask(fake_segmap, warped_clothmask, mode: str):
    """Cloth-channel composition (/root/reference/test_generator.py:167-176).

    'warp_grad' keeps gradient flowing through the warped mask; 'detach' uses a
    thresholded, gradient-stopped one-hot mask."""
    if mode == "no_composition":
        return fake_segmap
    if mode == "detach":
        m = jax.lax.stop_gradient(
            (warped_clothmask > 0.5).astype(fake_segmap.dtype))
    elif mode == "warp_grad":
        m = warped_clothmask
    else:
        raise ValueError(mode)
    cloth_ch = fake_segmap[..., 3:4] * m
    return jnp.concatenate(
        [fake_segmap[..., :3], cloth_ch, fake_segmap[..., 4:]], axis=-1)


def remove_overlap(seg_softmax, warped_cm):
    """Occlusion handling (/root/reference/test_generator.py:19-24): subtract the
    probability mass of body parts (channels 1,2 and 5..12) from the cloth mask."""
    body = jnp.sum(seg_softmax[..., 1:3], axis=-1, keepdims=True) + \
        jnp.sum(seg_softmax[..., 5:], axis=-1, keepdims=True)
    return warped_cm - body * warped_cm


def condition_forward(
    tocg_apply: Callable,
    batch: Dict[str, jax.Array],
    cfg: PipelineConfig,
    cloth_key: str = "cloth",
    clothmask_key: str = "cloth_mask",
) -> ConditionOutputs:
    """Frozen-tocg conditioning at (cond_h, cond_w), lifted to (fine_h, fine_w).

    Args:
      tocg_apply: fn(input1, input2) -> (flow_list, seg, warped_c, warped_cm)
        — a closure over the tocg variables, eval mode.
      batch: full-resolution NHWC dict with keys 'cloth', 'cloth_mask',
        'parse_agnostic' (13ch), 'densepose'.
    """
    ch, cw = cfg.cond_height, cfg.cond_width
    fh, fw = cfg.fine_height, cfg.fine_width

    cloth = batch[cloth_key]
    cm = (batch[clothmask_key] > 0.5).astype(cloth.dtype)
    parse_agnostic = batch["parse_agnostic"]
    densepose = batch["densepose"]

    # downsampling modes parity: test_generator.py:144-150
    cloth_down = interpolate(cloth, size=(ch, cw), mode="bilinear")
    cm_down = interpolate(cm, size=(ch, cw), mode="nearest")
    parse_agn_down = interpolate(parse_agnostic, size=(ch, cw), mode="nearest")
    densepose_down = interpolate(densepose, size=(ch, cw), mode="bilinear")

    input1 = jnp.concatenate([cloth_down, cm_down], axis=-1)
    input2 = jnp.concatenate([parse_agn_down, densepose_down], axis=-1)

    flow_list, fake_segmap, warped_c_lr, warped_cm_lr = tocg_apply(input1, input2)

    fake_segmap = compose_clothmask(fake_segmap, warped_cm_lr,
                                    cfg.clothmask_composition)

    # full-res parse: blur + argmax (test_generator.py:179-180)
    seg_full = interpolate(fake_segmap, size=(fh, fw), mode="bilinear")
    fake_parse_gauss = gaussian_blur(seg_full, (15, 15), (3.0, 3.0))
    fake_parse = jnp.argmax(fake_parse_gauss, axis=-1)
    # 13->7 regroup of an argmax one-hot == a label LUT + 7-way one-hot
    # (test_generator.py:180-203): pure elementwise — no 13-channel
    # intermediate and no regroup matmul whose conv-layout output forced
    # relayout copies into every SPADE seg consumer in the composed graph.
    # One-hot values are exact in bf16, so the pipeline compute dtype is
    # parity-free and keeps the seg convs in bf16. lut_lookup (compare-select
    # chain) instead of jnp.take: the 3.1M-point scalar gather measured
    # 25 ms/batch composed (tools/exp_cond_knockout.py r4); this is <1 ms.
    glabel = lut_lookup(fake_parse, group_index_of_label13())
    parse7 = (glabel[..., None] ==
              jnp.arange(7, dtype=jnp.int32)).astype(cloth.dtype)
    parse_labels = glabel.astype(jnp.int32)

    # full-res warp with condition-grid normalization constants 96/128
    # (test_generator.py:205-213)
    n = cloth.shape[0]
    flow_full = resize_flow(flow_list[-1], (fh, fw), mode="bilinear")
    fn = jnp.stack([flow_full[..., 0] / cfg.flow_norm_w,
                    flow_full[..., 1] / cfg.flow_norm_h], axis=-1)
    warped_grid = make_grid(n, fh, fw) + fn
    # one fused 4-channel gather instead of separate 3ch + 1ch warps
    warped = grid_sample(jnp.concatenate([cloth, cm], axis=-1), warped_grid,
                         padding_mode="border")
    warped_cloth = warped[..., :3]
    warped_clothmask = warped[..., 3:]

    if cfg.occlusion:
        warped_clothmask = remove_overlap(
            jax.nn.softmax(fake_parse_gauss, axis=-1), warped_clothmask)
        warped_cloth = warped_cloth * warped_clothmask + \
            (1.0 - warped_clothmask)

    return ConditionOutputs(flow_list, fake_segmap, warped_c_lr, warped_cm_lr,
                            fake_parse_gauss, fake_parse, parse7, parse_labels,
                            warped_cloth, warped_clothmask)


def tryon_forward(
    tocg_apply: Callable,
    generator_apply: Callable,
    batch: Dict[str, jax.Array],
    cfg: PipelineConfig,
    cloth_key: str = "cloth",
    clothmask_key: str = "cloth_mask",
):
    """Full unpaired try-on (test_generator.py:90-238).

    Args:
      generator_apply: fn(x9, parse7) -> rgb in [-1, 1] (closure incl. noise rng).
    Returns:
      (output_rgb, ConditionOutputs)
    """
    cond = condition_forward(tocg_apply, batch, cfg, cloth_key, clothmask_key)
    gen_in = jnp.concatenate(
        [batch["agnostic"], batch["densepose"], cond.warped_cloth], axis=-1)
    # Materialize the stage interface (identity barrier) so the generator's
    # 8-scale strided pyramid slices read a DENSE buffer instead of pulling
    # the warp/concat producer chain into each slice: −35.8 ms/b4 composed
    # in the salted-loop harness (218.7 → 182.9, after which the salted and
    # stacked wrappers AGREE at ~183 ms), neutral in bench.py's stacked
    # wrapper which never paid the pathology (r5 receipts:
    # tools/exp_gen_knockout.py 'pyramid' knock + ROADMAP §1).
    gen_in, labels = lax.optimization_barrier((gen_in, cond.parse_labels))
    output = generator_apply(gen_in, labels)
    return output, cond
