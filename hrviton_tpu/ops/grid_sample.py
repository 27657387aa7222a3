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

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "make_grid", "flow_warp"]


def _unnormalize(grid, h, w, align_corners):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        return (gx + 1.0) * 0.5 * (w - 1), (gy + 1.0) * 0.5 * (h - 1)
    return ((gx + 1.0) * w - 1.0) * 0.5, ((gy + 1.0) * h - 1.0) * 0.5


def _grid_sample_border(x, grid, align_corners):
    """Border-padded bilinear via 4 flat gathers with promised bounds.

    Two TPU-critical tricks (measured on v5e, each ~5x at 1024x768):
      * torch's border mode (clamp each corner index, keep weights) equals
        clamping the *coordinate* to [0, dim-1], clamping the patch start to
        [0, dim-2], and using weight = coord - start — so the four corner
        addresses are base, base+1, base+W, base+W+1, all provably in bounds;
      * mode='promise_in_bounds' on the gathers: XLA's default bounds handling
        for computed indices costs ~5.6x (89ms -> 16ms per 4-image batch).
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    ho, wo = grid.shape[1:3]
    p = ho * wo
    ix, iy = _unnormalize(grid, h, w, align_corners)

    ixc = jnp.clip(ix, 0.0, w - 1.0)
    iyc = jnp.clip(iy, 0.0, h - 1.0)
    sx = jnp.clip(jnp.floor(ixc), 0, max(w - 2, 0)).astype(jnp.int32)
    sy = jnp.clip(jnp.floor(iyc), 0, max(h - 2, 0)).astype(jnp.int32)
    # weights (gradient w.r.t. grid flows through these)
    wx = (ixc - sx.astype(jnp.float32)).reshape(n, p, 1)
    wy = (iyc - sy.astype(jnp.float32)).reshape(n, p, 1)

    base = (sy * w + sx).reshape(n, p)

    if c <= 32:
        # Pack the 4 bilinear corners onto the channel axis with two
        # roll+concat passes (vectorized, bandwidth-cheap), so ONE gather per
        # output pixel fetches [v00 | v01 | v10 | v11]. Gathers are pointwise
        # on TPU, so quartering the gather count is a ~3.2x measured speedup
        # at 1024x768x4 (97ms -> 30ms per 4-image batch). The rolls wrap at
        # the border, but sx<=W-2 / sy<=H-2 never addresses the wrapped
        # rows/cols. For wide-channel feature maps the per-fetch row is
        # already large, so the 4x prep memory isn't worth it (else branch).
        x01 = jnp.concatenate([x, jnp.roll(x, -1, axis=2)], axis=-1)
        x4 = jnp.concatenate([x01, jnp.roll(x01, -1, axis=1)], axis=-1)
        flat4 = x4.reshape(n, h * w, 4 * c)
        g = jnp.take_along_axis(flat4, base[..., None], axis=1,
                                mode="promise_in_bounds").astype(jnp.float32)
        g00, g01 = g[..., :c], g[..., c:2 * c]
        g10, g11 = g[..., 2 * c:3 * c], g[..., 3 * c:]
    else:
        flat = x.reshape(n, h * w, c)

        def ta(idx):
            return jnp.take_along_axis(
                flat, idx[..., None], axis=1,
                mode="promise_in_bounds").astype(jnp.float32)

        g00, g01 = ta(base), ta(base + 1)
        g10, g11 = ta(base + w), ta(base + w + 1)

    top = g00 * (1.0 - wx) + g01 * wx
    bot = g10 * (1.0 - wx) + g11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.reshape(n, ho, wo, c).astype(dtype)


def _grid_sample_zeros(x, grid, align_corners):
    """Zeros-padded bilinear via 4 masked corner gathers (the general path)."""
    n, h, w, c = x.shape
    dtype = x.dtype
    ix, iy = _unnormalize(grid, h, w, align_corners)

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = (ix - x0f)[..., None]
    wy = (iy - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = x.reshape(n, h * w, c)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc).reshape(n, -1)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1,
                                  mode="promise_in_bounds")
        out = out.reshape(n, *ix.shape[1:], c).astype(jnp.float32)
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return out * ok.astype(jnp.float32)[..., None]

    top = gather(y0, x0) * (1.0 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1.0 - wx) + gather(y1, x1) * wx
    return (top * (1.0 - wy) + bot * wy).astype(dtype)


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
    if padding_mode == "border":
        return _grid_sample_border(x, grid, align_corners)
    if padding_mode == "zeros":
        return _grid_sample_zeros(x, grid, align_corners)
    raise ValueError(f"unsupported padding_mode {padding_mode!r}")


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
