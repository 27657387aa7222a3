"""Discriminator feature-matching loss (/root/reference/train_generator.py:300-309).

For each scale i and each intermediate tap j (final logits excluded), accumulate
L1(fake_feat, stop_grad(real_feat)) * lambda_feat / num_D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["feature_matching_loss"]


def feature_matching_loss(pred_fake, pred_real, lambda_feat: float = 10.0):
    num_d = len(pred_fake)
    loss = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            diff = jnp.abs(pred_fake[i][j].astype(jnp.float32) -
                           jax.lax.stop_gradient(pred_real[i][j]).astype(jnp.float32))
            loss = loss + jnp.mean(diff) * lambda_feat / num_d
    return loss
