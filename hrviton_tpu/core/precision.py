"""Mixed-precision policy: bf16 compute / f32 params.

Replaces apex AMP O1 + loss scaling (/root/reference/train_generator.py:161-169);
bf16's exponent range makes loss scaling unnecessary on TPU. The policy is
applied functionally: params and activations are cast to bf16 at the jit
boundary; normalization layers internally compute statistics in f32
(see hrviton_tpu.nn.layers), so the numerically fragile reductions stay f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_floating", "bf16_params", "f32_params"]


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree to dtype, leave ints/bools alone."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def bf16_params(tree):
    return cast_floating(tree, jnp.bfloat16)


def f32_params(tree):
    return cast_floating(tree, jnp.float32)
