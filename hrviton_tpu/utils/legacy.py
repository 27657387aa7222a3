"""Legacy helper utilities (C18, /root/reference/utils.py:9-47,72-91).

Kept for API-surface parity with the reference's utils module; the modern
equivalents live in hrviton_tpu.ops.parse / losses.seg.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["get_clothes_mask", "changearm", "gen_noise", "ndim_tensor2im",
           "pred_to_onehot"]


def get_clothes_mask(label):
    """(.., H, W) int label map -> float mask of the cloth class (3)."""
    return (jnp.asarray(label) == 3).astype(jnp.float32)


def changearm(label):
    """Relabel arm classes (5, 6) to cloth (3) (utils.py:13-19)."""
    label = jnp.asarray(label)
    arm = (label == 5) | (label == 6)
    return jnp.where(arm, 3, label)


def gen_noise(shape, seed: int = 0):
    """Quantized uniform noise in [0, 1) (utils.py:21-27 semantics: uint8
    gaussian noise scaled down then floored)."""
    rng = np.random.default_rng(seed)
    noise = rng.normal(0, 255, shape).clip(0, 255).astype(np.uint8)
    return jnp.asarray((noise / 255).astype(np.uint8), dtype=jnp.float32)


def ndim_tensor2im(seg_nhwc, batch: int = 0):
    """(N, H, W, C) channel map -> (H, W) argmax uint8 labels (utils.py:44-47)."""
    return np.asarray(jnp.argmax(seg_nhwc[batch], axis=-1), dtype=np.uint8)


def pred_to_onehot(prediction):
    """(N, H, W, C) logits -> one-hot of the argmax (utils.py:72-78)."""
    c = prediction.shape[-1]
    am = jnp.argmax(prediction, axis=-1)
    return (am[..., None] == jnp.arange(c)).astype(jnp.float32)
