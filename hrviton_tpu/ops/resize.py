"""Torch-parity image resize, MXU-friendly.

Implements the exact sampling conventions of ``torch.nn.functional.interpolate``
(reference uses it throughout, e.g. /root/reference/test_generator.py:144-150,
/root/reference/networks.py:130-133) as static resize matrices applied with two
einsums — each is a matmul that XLA tiles onto the MXU, instead of a gather.

Supported modes:
  * 'bilinear' with align_corners False (torch default) or True
  * 'nearest'  (torch legacy floor convention: src = floor(dst * in/out))

All functions take NHWC arrays. Shapes are static under jit, so the matrices are
built once per (in, out, mode) with numpy and closed over as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interpolate", "resize_flow"]


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) row-stochastic matrix reproducing torch linear interpolation."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1 or in_size == 1:
        # torch: with align_corners=True and out==1 -> src 0; in==1 -> only idx 0.
        mat[:, 0] = 1.0
        if in_size == 1:
            return mat.astype(np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source indices to 0
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    lam = src - x0
    x1 = np.minimum(x0 + 1, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, x0), 1.0 - lam)
    np.add.at(mat, (rows, x1), lam)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (legacy): src = floor(dst * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _nearest_axis(x, out_size: int, axis: int):
    """Nearest resize of one spatial axis, torch legacy floor convention.

    Integer ratios — every call site in this model family (power-of-two
    pyramid scales) — reduce exactly to layout ops: ``src = floor(dst*in/out)``
    is a stride-k slice when in == k*out and a k-fold repeat when out == k*in.
    XLA fuses slices/broadcasts for free, whereas the general ``take`` path
    lowers to TPU gathers that materialize huge iota/select chains (measured:
    the SPADE stack's up/seg resizes dominated its non-conv HLO bytes).
    """
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    if in_size % out_size == 0:
        k = in_size // out_size
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(None, None, k)
        return x[tuple(sl)]
    if out_size % in_size == 0:
        k = out_size // in_size
        shape = list(x.shape)
        bshape = shape[:axis + 1] + [k] + shape[axis + 1:]
        y = jnp.broadcast_to(jnp.expand_dims(x, axis + 1), bshape)
        shape[axis] = out_size
        return y.reshape(shape)
    return jnp.take(x, jnp.asarray(_nearest_indices(in_size, out_size)),
                    axis=axis)


def _linear_axis_fast(xf, out_size: int, axis: int):
    """Integer-ratio linear DOWNSCALE of one axis, align_corners=False, f32.

    Exactly the 2-tap math of the torch resize matrix (same float32 lambda,
    same sources: src_i = (i+0.5)k - 0.5, never out of range for k >= 2)
    as a two-strided-slice lerp XLA fuses into neighbours, instead of an
    f32 HIGHEST matmul. Upscales are NOT worth the analogous phase
    interleave: the shift/concat/stack chain materializes more copies than
    the matmul reads (measured composed 16.19 vs 17.0 img/s, round 4).
    Returns None when the ratio is not integer.
    """
    in_size = xf.shape[axis]
    if in_size % out_size or in_size == out_size:
        return None
    sl = lambda a, b, st: tuple(
        slice(a, b, st) if i == axis else slice(None) for i in range(xf.ndim))
    k = in_size // out_size
    src0 = np.float64(k) / 2.0 - 0.5                  # src of out 0 (>= 0)
    off = int(np.floor(src0))
    lam = np.float32(src0 - off)
    a = xf[sl(off, off + k * out_size, k)]
    if lam == 0:
        return a
    b = xf[sl(off + 1, off + 1 + k * out_size, k)]
    return a * np.float32(1.0 - np.float64(lam)) + b * lam


def interpolate(x, size=None, scale_factor=None, mode: str = "bilinear",
                align_corners: bool = False):
    """NHWC resize with torch ``F.interpolate`` semantics.

    Args:
      x: (N, H, W, C) array.
      size: (out_h, out_w) tuple, or None if scale_factor given.
      scale_factor: float or (fh, fw); torch computes out = floor(in * factor).
      mode: 'bilinear' | 'nearest'.
      align_corners: only meaningful for 'bilinear'.
    """
    n, h, w, c = x.shape
    if size is None:
        if scale_factor is None:
            raise ValueError("one of size / scale_factor is required")
        if isinstance(scale_factor, (int, float)):
            scale_factor = (scale_factor, scale_factor)
        size = (int(h * scale_factor[0]), int(w * scale_factor[1]))
    out_h, out_w = int(size[0]), int(size[1])
    if (out_h, out_w) == (h, w):
        return x

    if mode == "nearest":
        return _nearest_axis(_nearest_axis(x, out_h, 1), out_w, 2)
    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")

    dtype = x.dtype
    # bf16 inputs with exactly-bf16-representable resize weights (all
    # power-of-two ratios: lam is a multiple of 1/2k) take DEFAULT-precision
    # bf16 einsums: bf16 x bf16 -> f32 MXU accumulation is bit-equal to the
    # f32 HIGHEST product of the same bf16 inputs, at 1/3-1/6 the MXU passes
    # and no f32 materialization of the big resized tensors (the condition
    # stage carried 135 GB of logical traffic from these,
    # tools/exp_roofline.py round 4).
    def matrix(in_size, out_size):
        m = _linear_matrix(in_size, out_size, align_corners)
        cheap = (dtype == jnp.bfloat16
                 and np.all(m == m.astype(np.float32).astype(jnp.bfloat16)
                            .astype(np.float32)))
        if cheap:
            return jnp.asarray(m, dtype=jnp.bfloat16), None
        return (jnp.asarray(m, dtype=jnp.float32),
                jax.lax.Precision.HIGHEST)

    y = x
    if out_h != h:
        fast = None
        if not align_corners and h % out_h == 0:   # strided-slice downscale
            fast = _linear_axis_fast(y.astype(jnp.float32), out_h, 1)
        if fast is not None:
            y = fast.astype(dtype)
        else:
            rh, prec = matrix(h, out_h)
            yin = y if prec is None else y.astype(jnp.float32)
            y = jnp.einsum("oh,nhwc->nowc", rh, yin, precision=prec,
                           preferred_element_type=jnp.float32).astype(dtype)
    if out_w != w:
        fast = None
        if not align_corners and w % out_w == 0:
            fast = _linear_axis_fast(y.astype(jnp.float32), out_w, 2)
        if fast is not None:
            y = fast.astype(dtype)
        else:
            rw, prec = matrix(w, out_w)
            yin = y if prec is None else y.astype(jnp.float32)
            y = jnp.einsum("ow,nhwc->nhoc", rw, yin, precision=prec,
                           preferred_element_type=jnp.float32).astype(dtype)
    return y


def resize_flow(flow, size, mode: str = "bilinear"):
    """Resize a (N, H, W, 2) appearance-flow field (channel-last, torch permute-free).

    Mirrors the reference's permute->interpolate->permute dance
    (/root/reference/networks.py:133,150) without the transposes.
    """
    return interpolate(flow, size=size, mode=mode, align_corners=False)
