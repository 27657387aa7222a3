"""Optimizers & LR schedules with reference-exact hyperparameters.

  * Stage 1: Adam(0.5, 0.999), constant 2e-4 for G and D
    (/root/reference/train_condition.py:99-100,129-130).
  * Stage 2: Adam(0, 0.9) with TTUR (G 1e-4 / D 4e-4) and a LambdaLR linear
    decay stepped every 1000 iterations
    (/root/reference/train_generator.py:154-159,596-598).
"""

from __future__ import annotations

import optax

__all__ = ["adam", "lambda_decay_schedule"]


def adam(lr, b1: float, b2: float, schedule=None) -> optax.GradientTransformation:
    if schedule is not None:
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
            optax.scale_by_schedule(lambda count: -lr * schedule(count)),
        )
    return optax.adam(lr, b1=b1, b2=b2, eps=1e-8)


def lambda_decay_schedule(keep_step: int, decay_step: int, load_step: int = 0):
    """Multiplier(t) replicating LambdaLR(lambda s: 1 - max(0, s*1000 +
    load - keep)/(decay+1)) stepped once per 1000 iterations."""
    def mult(count):
        s = (count // 1000) * 1000
        frac = (s + load_step - keep_step) / float(decay_step + 1)
        return 1.0 - max_(frac, 0.0)
    return mult


def max_(a, b):
    import jax.numpy as jnp
    return jnp.maximum(a, b)
