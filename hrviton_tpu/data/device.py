"""Device-side batch expansion for the compact (uint8) wire format.

TPU-native split of the reference's per-sample CPU preprocessing
(/root/reference/cp_dataset.py:118-244): the host emits only what needs PIL
(decode, resize, agnostic drawing) as uint8, and the normalize / one-hot /
remap / composite math — ~70 ms/sample of host time in the f32 format, and 4x
the host->device bytes — runs vectorized on device with bit-identical
formulas:

  image   = u8 * (2/255) - 1                  (ToTensor+Normalize(.5,.5))
  parse   = onehot(group_idx, semantic_nc)    (cp_dataset.py:150-177)
  pcm     = parse[..., 3:4]
  parse_cloth = image * pcm + (1 - pcm)       (cp_dataset.py:194-195)

``expand_compact`` is a pure jittable function; under a mesh it is
elementwise on the batch axis, so sharded uint8 inputs expand shard-local
with no communication.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from hrviton_tpu.ops.parse import onehot

__all__ = ["expand_compact", "COMPACT_KEYS"]

# keys a compact batch carries instead of the full-contract keys
COMPACT_KEYS = ("parse_idx", "parse_agnostic_idx")


def _img(u8, dtype):
    x = u8.astype(jnp.float32) * jnp.float32(2.0 / 255.0) - jnp.float32(1.0)
    return x.astype(dtype)


def _labels13(idx_u8, semantic_nc: int, dtype):
    oh = onehot(idx_u8.astype(jnp.int32), 13).astype(dtype)
    if semantic_nc > 13:
        pad = [(0, 0)] * (oh.ndim - 1) + [(0, semantic_nc - 13)]
        oh = jnp.pad(oh, pad)
    elif semantic_nc < 13:
        raise ValueError(f"semantic_nc={semantic_nc} < 13")
    return oh


def expand_compact(batch: Dict, semantic_nc: int = 13,
                   dtype=jnp.float32) -> Dict:
    """Compact uint8 batch (N-stacked VitonHDDataset(compact=True) samples,
    string keys dropped) -> the full reference dict contract on device."""
    out: Dict = {}
    # cloth keys may be nested ({'paired': ...}) or pre-flattened (the
    # stage-2 trainer's contract, train_generator.py:195-196)
    if isinstance(batch["cloth"], dict):
        out["cloth"] = {k: _img(v, dtype) for k, v in batch["cloth"].items()}
        out["cloth_mask"] = {k: v.astype(dtype)
                             for k, v in batch["cloth_mask"].items()}
    else:
        out["cloth"] = _img(batch["cloth"], dtype)
        out["cloth_mask"] = batch["cloth_mask"].astype(dtype)
    parse13 = _labels13(batch["parse_idx"], semantic_nc, dtype)
    out["parse"] = parse13
    out["parse_onehot"] = batch["parse_idx"].astype(jnp.int32)
    out["parse_agnostic"] = _labels13(batch["parse_agnostic_idx"],
                                      semantic_nc, dtype)
    image = _img(batch["image"], dtype)
    out["image"] = image
    pcm = parse13[..., 3:4]
    out["pcm"] = pcm
    out["parse_cloth"] = image * pcm + (1.0 - pcm)
    out["densepose"] = _img(batch["densepose"], dtype)
    out["pose"] = _img(batch["pose"], dtype)
    if "agnostic" in batch:
        out["agnostic"] = _img(batch["agnostic"], dtype)
    return out
