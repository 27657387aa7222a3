"""Pallas TPU kernel: fused [pre-activation ->] 3x3 conv [-> bias].

The stride-1 pad-1 3x3 convolution is the hot op of the SPADE generator at
1024x768 (/root/reference/network_generator.py:125-173 runs six of them per
block) and of the tocg feature pyramids (networks.py:171-198). XLA's conv at
these shapes reaches ~25% of the chip's roofline on v5e; this kernel reaches
~1.5x XLA by streaming row-bands HBM->VMEM with double-buffered manual DMA and
computing each kernel tap as an *aligned* (TH*W, C) x (C, Cout) MXU matmul,
shifting the f32 partial products with cheap 32-bit lane rotates instead of
re-slicing the input at unaligned offsets (see tools/exp_pallas_conv2.py for
the A/B record of rejected formulations, and the Mosaic pitfalls they hit).

Fusion: when this kernel replaces an XLA conv, XLA can no longer fuse the
neighbouring elementwise work into it, so the kernel takes the producer-side
activation (leaky_relu / relu applied to its input) and the consumer-side bias
add as optional fused pieces. Numerics match the unfused reference exactly:
the activation is elementwise and the conv accumulates in f32 either way.

Training: `conv3x3` carries a custom VJP whose backward pass is the standard
XLA formulation (via jax.vjp of the reference conv), so the op is fully
differentiable; only the forward uses Pallas.

Enablement: `fast_conv_enabled()` is consulted by nn.Conv2d/SpectralNorm2d at
trace time. Off by default; the inference pipeline / bench enable it via
`enable_fast_conv(True)` or the `fast_conv()` context manager.
"""

from __future__ import annotations

import contextlib
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_eligible", "enable_fast_conv",
           "fast_conv_enabled", "fast_conv", "enable_taps_wgrad",
           "taps_wgrad_enabled", "taps_wgrad"]

_TH = 8          # rows per grid step; VMEM (~16M) caps TH*W*C buffers
_ENABLED = False
_TAPS_WGRAD = False
_INTERPRET = bool(int(os.environ.get("HRVITON_PALLAS_INTERPRET", "0")))


def enable_fast_conv(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def fast_conv_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def fast_conv(on: bool = True):
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(on)
    try:
        yield
    finally:
        _ENABLED = prev


def enable_taps_wgrad(on: bool = True) -> None:
    """Route 3x3/s1/p1 conv weight-gradients through the scan-chunked tap
    formulation instead of XLA's autodiff conv-wgrad. Numerically equivalent
    (f32 accumulation either way) but avoids the padded im2col buffer XLA
    materializes for full-res wgrads (~1.1 GB per conv at 1024x768 b2), the
    temp that keeps stage-2 training from fitting batch 2 on a 16 GB chip."""
    global _TAPS_WGRAD
    _TAPS_WGRAD = bool(on)


def taps_wgrad_enabled() -> bool:
    return _TAPS_WGRAD


@contextlib.contextmanager
def taps_wgrad(on: bool = True):
    global _TAPS_WGRAD
    prev = _TAPS_WGRAD
    _TAPS_WGRAD = bool(on)
    try:
        yield
    finally:
        _TAPS_WGRAD = prev


def conv3x3_eligible(x_shape, w_shape, stride, padding, dtype) -> bool:
    """Static dispatch test: shapes/layout this kernel handles AND wins on."""
    if not _ENABLED:
        return False
    n, h, w, cin = x_shape
    if w_shape[:2] != (3, 3) or tuple(stride) != (1, 1):
        return False
    if tuple(padding) != (1, 1):
        return False
    # Correctness gates — hold in interpret mode too: h % _TH != 0 would
    # silently drop the remainder rows (grid truncates), and h == _TH would
    # fire both boundary pl.when branches on the same grid step.
    if not (h % _TH == 0 and w % 8 == 0 and h > _TH):
        return False
    if _INTERPRET:
        return True
    # Hardware-specific gates below.
    if jax.default_backend() == "cpu":
        return False
    if dtype != jnp.bfloat16:
        return False     # f32 tiles double VMEM and lose the TH=8 budget
    # Big enough to win over XLA (measured crossover ~256x192; below that
    # XLA's fusion wins). cin must be lane-tile aligned: the manual
    # HBM->VMEM row-band DMA rejects slices whose minor dim isn't a multiple
    # of 128 ("Slice shape along dimension 3 must be aligned to tiling").
    # This still covers the FLOPs-dominant convs (SPADE gamma/beta run
    # 128->norm_nc).
    return h >= 128 and w >= 96 and cin % 128 == 0


def _act(x, pre_act):
    if pre_act is None:
        return x
    if pre_act == "relu":
        return jax.nn.relu(x)
    if pre_act == "leaky0.2":
        # max(x, 0.2x) == leaky_relu(x, 0.2) exactly for 0 < alpha < 1, and
        # avoids where(x >= 0, ...): Mosaic rejects bf16 vector compares.
        return jnp.maximum(x, 0.2 * x)
    raise ValueError(pre_act)


def _roll_cols(p, kx, wv, col):
    """acc[q] += p[q + kx - 1] with zero boundary columns."""
    if kx == 1:
        return p
    if kx == 0:
        r = (jnp.roll(p, 1, axis=1) if _INTERPRET
             else pltpu.roll(p, 1, axis=1))
        return jnp.where(col == 0, 0.0, r)
    r = (jnp.roll(p, -1, axis=1) if _INTERPRET
         else pltpu.roll(p, wv - 1, axis=1))
    return jnp.where(col == wv - 1, 0.0, r)


def _kernel(x_hbm, w_ref, b_ref, o_ref, tile, sem, *, pre_act):
    # x_hbm: (B, H, W, C) in ANY; w_ref: (9, C, Cout) VMEM; b_ref: (1, Cout)
    # o_ref: (1, TH, W, Cout) block; tile: (2, TH+2, W, C) double buffer.
    # tile rows represent x rows [i*TH-1, i*TH+TH+1); missing edge rows zeroed.
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    cout = o_ref.shape[-1]
    n_i = pl.num_programs(1)

    def fetch(slot, idx, start):
        # first/last tiles clamp the DMA to in-range rows; the wait must use
        # the same descriptor (semaphore counts bytes), hence same structure
        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(0, th + 1)],
                                       tile.at[slot, pl.ds(1, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                                       tile.at[slot], sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == n_i - 1)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                                       tile.at[slot, pl.ds(0, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)

    @pl.when(i + 1 < n_i)
    def _():
        fetch((i + 1) % 2, i + 1, True)

    slot = i % 2
    fetch(slot, i, False)

    @pl.when(i == 0)
    def _():
        tile[slot, 0] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    @pl.when(i == n_i - 1)
    def _():
        tile[slot, th + 1] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    acc = jnp.zeros((th, wv, cout), jnp.float32)
    for ky in range(3):
        rows = tile[pl.ds(slot, 1), ky:ky + th][0]   # aligned band load
        rows = _act(rows, pre_act)                   # edge rows stay zero
        for kx in range(3):
            p = lax.dot_general(
                rows, w_ref[3 * ky + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + _roll_cols(p, kx, wv, col)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _conv3x3_pallas(x, w, bias, pre_act):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    wk = w.reshape(9, cin, cout).astype(x.dtype)
    b = (jnp.zeros((1, cout), x.dtype) if bias is None
         else bias.reshape(1, cout).astype(x.dtype))
    return pl.pallas_call(
        partial(_kernel, pre_act=pre_act),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        grid=(n, h // _TH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((9, cin, cout), lambda b_, i: (0, 0, 0)),
                  pl.BlockSpec((1, cout), lambda b_, i: (0, 0))],
        out_specs=pl.BlockSpec((1, _TH, ww, cout), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, _TH + 2, ww, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_INTERPRET,
    )(x, wk, b)


def _conv3x3_ref(x, w, bias, pre_act):
    """XLA reference (backward pass + ineligible shapes)."""
    x = _act(x, pre_act)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                 ((1, 1), (1, 1)), dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_cvjp(x, w, bias, pre_act, has_bias):
    return _conv3x3_pallas(x, w, bias, pre_act)


def _cvjp_fwd(x, w, bias, pre_act, has_bias):
    return _conv3x3_pallas(x, w, bias, pre_act), (x, w, bias)


def _cvjp_bwd(pre_act, has_bias, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _conv3x3_ref(x_, w_, b_, pre_act),
                     x, w, bias if has_bias else jnp.zeros(
                         (w.shape[-1],), x.dtype))
    gx, gw, gb = vjp(g)
    return gx, gw, (gb if has_bias else None)


_conv3x3_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


# ------------------------------------------------- im2col-free weight gradient

def _row_chunk(h: int) -> int:
    for r in (128, 64, 32, 16, 8, 4, 2):
        if h % r == 0 and h > r:
            return r
    return h


def _wgrad_taps(x, g, pre_act):
    """dW for a 3x3/s1/p1 conv as 9 tap-contractions, scanned over row chunks.

    dW[ky,kx,ci,co] = sum_{n,h,w} act(x)[n, h+ky-1, w+kx-1, ci] * g[n,h,w,co]
    with zero boundary. Each chunk materializes only (N, R+2, W+2, Cin) —
    no (N*H*W, 9*Cin) im2col buffer ever exists.
    """
    n, h, wd, cin = x.shape
    cout = g.shape[-1]
    r = _row_chunk(h)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def body(acc, j):
        rows = lax.dynamic_slice(xp, (0, j * r, 0, 0), (n, r + 2, wd + 2, cin))
        rows = _act(rows, pre_act)  # relu/leaky keep the zero padding zero
        gc = lax.dynamic_slice(g, (0, j * r, 0, 0), (n, r, wd, cout))
        taps = []
        for ky in range(3):
            for kx in range(3):
                xs = lax.slice(rows, (0, ky, kx, 0),
                               (n, ky + r, kx + wd, cin))
                taps.append(lax.dot_general(
                    xs, gc,
                    dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32))
        return acc + jnp.stack(taps), None

    acc0 = jnp.zeros((9, cin, cout), jnp.float32)
    acc, _ = lax.scan(body, acc0, jnp.arange(h // r))
    return acc.reshape(3, 3, cin, cout)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_taps(x, w, bias, pre_act, has_bias):
    return _conv3x3_ref(x, w, bias, pre_act)


def _taps_fwd(x, w, bias, pre_act, has_bias):
    return _conv3x3_ref(x, w, bias, pre_act), (x, w)


def _taps_bwd(pre_act, has_bias, res, g):
    x, w = res
    # dx: conv of g with the spatially-flipped, IO-transposed kernel (a plain
    # direct conv — only the wgrad needs the im2col-free formulation)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dn = lax.conv_dimension_numbers(g.shape, w_rot.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    da = lax.conv_general_dilated(g, w_rot.astype(g.dtype), (1, 1),
                                  ((1, 1), (1, 1)), dimension_numbers=dn)
    if pre_act is None:
        dx = da
    elif pre_act == "relu":
        dx = da * (x > 0).astype(da.dtype)
    elif pre_act == "leaky0.2":
        dx = da * jnp.where(x > 0, 1.0, 0.2).astype(da.dtype)
    else:
        raise ValueError(pre_act)
    dw = _wgrad_taps(x, g, pre_act).astype(w.dtype)
    db = (jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
          if has_bias else None)
    return dx.astype(x.dtype), dw, db


_conv3x3_taps.defvjp(_taps_fwd, _taps_bwd)


# --------------------------------------------- small-cout full-res conv ----
# conv_img (32->3 at 1024x768, /root/reference/network_generator.py:220) is
# the SPADE generator's last full-res op: XLA runs it at 9.3 ms/b4 — 3x its
# MXU M-bound floor (#pixels cycles) — because the 3-lane output forces bad
# layouts. This kernel feeds the halo from THREE clipped BlockSpec views of
# x (rows i-1 / i / i+1: no manual DMA, so Cin needn't be lane-aligned),
# builds ky-lane-merged rows and runs ONE kx-lane-merged dot (K = 3*Cin,
# N = 3*Cout) with f32 product rolls. Measured 9.34 -> ~4.4 ms.

_VTH = 8
# Off by default: measured 10.82 vs 9.45 ms XLA at conv_img's shape — the op
# is M-bound on the MXU (one pixel-row per cycle regardless of the tiny
# K/N), so the kernel's fewer HBM trips can't offset its 3-view reads.
# Kept as an exact, tested receipt; enable via this switch to re-measure.
_VIEWS = False


def _views_eligible(x_shape, w_shape, stride, padding, dtype) -> bool:
    n, h, w, cin = x_shape
    if not _VIEWS:
        return False
    if w_shape[:2] != (3, 3) or tuple(stride) != (1, 1) \
            or tuple(padding) != (1, 1):
        return False
    if not (h % _VTH == 0 and w % 128 == 0 and h > _VTH):
        return False
    if _INTERPRET:
        return w_shape[3] * 3 <= 128 and cin * 3 <= 128
    if jax.default_backend() == "cpu" or dtype != jnp.bfloat16:
        return False
    # small-cout only: wider outputs belong to the banded kernel / XLA
    return w_shape[3] * 3 <= 128 and cin * 3 <= 128 and h >= 512


def _views_kernel(xu_ref, xc_ref, xd_ref, w_ref, b_ref, o_ref,
                  *, pre_act):
    # xu/xc/xd: (1, TH, W, C) blocks at rows i-1 / i / i+1 (clipped);
    # w: (1, 3C, 3*cout) ky-row kx-lane merged; b: (1, cout);
    # o: (1, TH, W, cout).
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    cout = w_ref.shape[-1] // 3
    dtype = o_ref.dtype
    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)

    xc = _act(xc_ref[0], pre_act)
    up_row = _act(xu_ref[0, th - 1:th], pre_act)
    up_row = jnp.where(i == 0, jnp.zeros_like(up_row), up_row)
    dn_row = _act(xd_ref[0, 0:1], pre_act)
    dn_row = jnp.where(i == n_i - 1, jnp.zeros_like(dn_row), dn_row)
    band0 = jnp.concatenate([up_row, xc[:th - 1]], axis=0)
    band2 = jnp.concatenate([xc[1:], dn_row], axis=0)
    rows3 = jnp.concatenate([band0, xc, band2], axis=-1)   # (TH, W, 3C)

    p = lax.dot_general(rows3, w_ref[0],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    acc = jnp.zeros((th, wv, cout), jnp.float32)
    for kx in range(3):
        acc = acc + _roll_cols(p[..., kx * cout:(kx + 1) * cout],
                               kx, wv, col)
    o_ref[0] = acc.astype(dtype) + b_ref[0].astype(dtype)


def _conv3x3_views_pallas(x, w, bias, pre_act):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    wk = jnp.concatenate(
        [w[:, kx].reshape(3 * cin, cout) for kx in range(3)],
        axis=-1).reshape(1, 3 * cin, 3 * cout).astype(x.dtype)
    b = (jnp.zeros((1, cout), jnp.float32) if bias is None
         else bias.reshape(1, cout).astype(jnp.float32))
    n_i = h // _VTH
    blk = lambda off: pl.BlockSpec(
        (1, _VTH, ww, cin),
        lambda b_, i, o=off: (b_, jnp.clip(i + o, 0, n_i - 1), 0, 0))
    return pl.pallas_call(
        partial(_views_kernel, pre_act=pre_act),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        grid=(n, n_i),
        in_specs=[blk(-1), blk(0), blk(1),
                  pl.BlockSpec(wk.shape, lambda b_, i: (0, 0, 0)),
                  pl.BlockSpec((1, cout), lambda b_, i: (0, 0))],
        out_specs=pl.BlockSpec((1, _VTH, ww, cout),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_INTERPRET,
    )(x, x, x, wk, b)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_views_cvjp(x, w, bias, pre_act, has_bias):
    return _conv3x3_views_pallas(x, w, bias, pre_act)


def _views_fwd(x, w, bias, pre_act, has_bias):
    return _conv3x3_views_pallas(x, w, bias, pre_act), (x, w, bias)


_conv3x3_views_cvjp.defvjp(_views_fwd, _cvjp_bwd)


def conv3x3(x, w, bias=None, pre_act=None):
    """Fused pre_act -> 3x3/s1/p1 conv -> bias, Pallas when eligible.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; bias: (Cout,) or None;
    pre_act: None | 'relu' | 'leaky0.2' applied to x before the conv.
    """
    if _views_eligible(x.shape, w.shape, (1, 1), (1, 1), x.dtype):
        return _conv3x3_views_cvjp(x, w, bias, pre_act, bias is not None)
    if conv3x3_eligible(x.shape, w.shape, (1, 1), (1, 1), x.dtype):
        return _conv3x3_cvjp(x, w, bias, pre_act, bias is not None)
    if _TAPS_WGRAD:
        return _conv3x3_taps(x, w, bias, pre_act, bias is not None)
    return _conv3x3_ref(x, w, bias, pre_act)
