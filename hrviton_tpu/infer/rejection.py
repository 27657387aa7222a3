"""Discriminator rejection (C15): offline norm-constant + per-sample scoring.

Parity with /root/reference/get_norm_const.py:60-132 and
test_condition.py:118-127:
  * d_logit: mean of each scale's final logit map / 2, summed over scales.
  * norm constant M: max over the train set of odds l/(1-l) for both real and
    fake segmaps.
  * rejection score per test sample: (s/(1-s)) / M.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["d_logit", "odds", "norm_const_from_logits", "rejection_scores"]


def d_logit(pred) -> jax.Array:
    """Multiscale D output -> per-sample score (get_norm_const.py:60-64)."""
    score = 0.0
    for scale in pred:
        final = scale[-1] if isinstance(scale, (list, tuple)) else scale
        score = score + jnp.mean(final.astype(jnp.float32), axis=(1, 2, 3)) / 2.0
    return score


def odds(logit):
    return logit / (1.0 - logit)


def norm_const_from_logits(real_logits: Iterable, fake_logits: Iterable) -> float:
    """M = max odds over all real+fake samples (get_norm_const.py:119-132)."""
    vals: List[float] = []
    for arr in list(real_logits) + list(fake_logits):
        vals.extend(np.asarray(odds(jnp.asarray(arr))).reshape(-1).tolist())
    return float(sorted(vals)[-1])


def rejection_scores(logits, norm_const: float) -> np.ndarray:
    """(s/(1-s))/M per sample (test_condition.py:123)."""
    return np.asarray(odds(jnp.asarray(logits))) / norm_const
