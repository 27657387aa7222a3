"""Separable Gaussian blur with torchgeometry parity.

The reference blurs the 13-channel upsampled segmap with
``tgm.image.GaussianBlur((15, 15), (3, 3))`` before the argmax
(/root/reference/train_generator.py:181,241; test_generator.py:91,179).
torchgeometry builds a normalized 1-D kernel exp(-x^2 / (2 sigma^2)) and runs a
zero-padded depthwise conv2d. We implement it as two depthwise 1-D convolutions
(XLA fuses these tightly; the op is HBM-bandwidth-bound at 1024x768x13).
"""

from __future__ import annotations

import functools

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_kernel1d", "gaussian_blur"]


@functools.lru_cache(maxsize=None)
def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    if ksize % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def gaussian_blur(x, ksize=(15, 15), sigma=(3.0, 3.0)):
    """Depthwise Gaussian blur of an NHWC array, zero padding (tgm parity)."""
    n, h, w, c = x.shape
    kh, kw = ksize
    dtype = x.dtype
    y = x.astype(jnp.float32)

    dn = lax.conv_dimension_numbers((n, h, w, c), (kh, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    k_h = jnp.asarray(gaussian_kernel1d(kh, float(sigma[1] if len(sigma) > 1 else sigma[0])))
    k_w = jnp.asarray(gaussian_kernel1d(kw, float(sigma[0])))
    # torchgeometry kernel2d = outer(g(kh, sigma_y), g(kw, sigma_x)); separable.
    kern_h = jnp.broadcast_to(k_h[:, None, None, None], (kh, 1, 1, c))
    kern_w = jnp.broadcast_to(k_w[None, :, None, None], (1, kw, 1, c))
    y = lax.conv_general_dilated(y, kern_h, window_strides=(1, 1),
                                 padding=((kh // 2, kh // 2), (0, 0)),
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    y = lax.conv_general_dilated(y, kern_w, window_strides=(1, 1),
                                 padding=((0, 0), (kw // 2, kw // 2)),
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return y.astype(dtype)
