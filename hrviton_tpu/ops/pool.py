"""Pooling ops with torch semantics.

The multiscale discriminators downsample with
``AvgPool2d(3, stride=2, padding=1, count_include_pad=False)``
(/root/reference/networks.py:320, network_generator.py:301-302).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

__all__ = ["avg_pool2d_nopad"]


def avg_pool2d_nopad(x, ksize: int = 3, stride: int = 2, padding: int = 1):
    """NHWC average pool, zero-padded, count_include_pad=False."""
    dtype = x.dtype
    y = x.astype(jnp.float32)
    window = (1, ksize, ksize, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(y, 0.0, lax.add, window, strides, pads)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=jnp.float32)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pads)
    return (summed / counts).astype(dtype)
