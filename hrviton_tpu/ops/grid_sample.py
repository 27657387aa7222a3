"""Bilinear grid sampling (appearance-flow warping) with torch-exact semantics.

This is the correctness-critical warp op of the condition generator — semantics of
``F.grid_sample(input, grid, padding_mode='border')`` at
/root/reference/networks.py:135,143,152 and /root/reference/test_generator.py:212
(align_corners=False, torch's default since 1.3).

TPU notes: there is no native gather-bilinear unit; we lower to four clamped
gathers via ``take_along_axis`` over the flattened spatial axis plus a VPU blend.
The gradient flows through both the input (scatter-add adjoint of the gathers)
and the grid (through the fractional weights), which the reference's
``warp_grad`` cloth-mask composition mode requires
(/root/reference/train_condition.py:170-173).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample", "make_grid", "flow_warp"]


def grid_sample(x, grid, padding_mode: str = "border", align_corners: bool = False):
    """Sample ``x`` at normalized ``grid`` locations, bilinear.

    Args:
      x: (N, H, W, C) input feature map / image.
      grid: (N, Ho, Wo, 2) normalized sample coords in [-1, 1]; last axis is
        (x=width, y=height), matching torch.
      padding_mode: 'border' (clamp) or 'zeros'.
      align_corners: coordinate unnormalization convention.

    Returns:
      (N, Ho, Wo, C) sampled output with x.dtype.
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f  # gradient w.r.t. grid flows through these weights
    wy = iy - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    flat = x.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, -1)  # (N, Ho*Wo)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(n, *gx.shape[1:], c)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    if padding_mode == "zeros":
        def valid(yi, xi):
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            return ok.astype(jnp.float32)[..., None]
        v00 = v00 * valid(y0, x0)
        v01 = v01 * valid(y0, x1)
        v10 = v10 * valid(y1, x0)
        v11 = v11 * valid(y1, x1)
    elif padding_mode != "border":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.astype(dtype)


def make_grid(n: int, h: int, w: int):
    """Identity sampling grid, (N, H, W, 2) with (x, y) in [-1, 1].

    Parity with ``make_grid`` at /root/reference/networks.py:161-168 (linspace
    endpoints inclusive, i.e. align_corners=True-style grid, which combined with
    align_corners=False sampling is exactly what the reference computes).
    """
    gx = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    gy = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    gx = jnp.broadcast_to(gx[None, None, :], (n, h, w))
    gy = jnp.broadcast_to(gy[None, :, None], (n, h, w))
    return jnp.stack([gx, gy], axis=-1)


def flow_warp(x, flow, norm_w: float, norm_h: float, padding_mode: str = "border"):
    """Warp ``x`` by a pixel-unit flow field normalized by (norm_w, norm_h).

    The reference normalizes flow by ((W/2 - 1)/2, (H/2 - 1)/2) of the *flow's
    native* resolution before adding the identity grid
    (/root/reference/networks.py:134-135, test_generator.py:208-212).

    Args:
      x: (N, H, W, C); flow: (N, H, W, 2) in pixel units of its native scale.
    """
    n, h, w, _ = x.shape
    fn = jnp.stack([flow[..., 0] / norm_w, flow[..., 1] / norm_h], axis=-1)
    return grid_sample(x, fn + make_grid(n, h, w), padding_mode=padding_mode)
