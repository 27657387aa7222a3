"""GAN objectives — both reference flavors.

  * ``lsgan_loss``: the condition stage's LSGAN/MSE criterion
    (/root/reference/networks.py:258-299) over multiscale output lists.
  * ``gan_loss``: the SPADE stage's criterion with 'ls' | 'original' | 'hinge' |
    'w' modes (/root/reference/network_generator.py:318-398), averaging over the
    multiscale list.

Both consume the discriminators' list-of-lists output contract (final logit map
is element [-1] of each per-scale list).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

__all__ = ["lsgan_loss", "gan_loss"]


def _final_logits(pred):
    """[[...feats..., logits], ...] -> list of per-scale logit maps."""
    return [p[-1] if isinstance(p, (list, tuple)) else p for p in pred]


def lsgan_loss(pred: Sequence, target_is_real: bool):
    """Sum of per-scale MSE vs 0/1 targets (networks.py:289-299)."""
    target = 1.0 if target_is_real else 0.0
    loss = 0.0
    for logits in _final_logits(pred):
        loss = loss + jnp.mean((logits.astype(jnp.float32) - target) ** 2)
    return loss


def gan_loss(pred: Sequence, target_is_real: bool, mode: str = "hinge",
             for_discriminator: bool = True):
    """Multiscale-averaged GAN loss (network_generator.py:357-398)."""
    logits_list = _final_logits(pred)

    def one(logits):
        x = logits.astype(jnp.float32)
        if mode == "original":
            t = 1.0 if target_is_real else 0.0
            # BCE-with-logits
            return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
        if mode == "ls":
            t = 1.0 if target_is_real else 0.0
            return jnp.mean((x - t) ** 2)
        if mode == "hinge":
            if for_discriminator:
                if target_is_real:
                    return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
                return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
            assert target_is_real, "generator hinge loss aims for real"
            return -jnp.mean(x)
        if mode == "w":
            return -jnp.mean(x) if target_is_real else jnp.mean(x)
        raise ValueError(mode)

    total = 0.0
    for logits in logits_list:
        total = total + one(logits)
    return total / len(logits_list)
