"""Pallas TPU kernel: fused SPADE-norm modulation chain.

The SPADE generator's per-norm chain (/root/reference/network_generator.py:
75-122)

    xn         = x + noise * noise_scale
    normalized = instance_norm(xn)
    actv       = relu(conv_shared(seg))
    out        = normalized * (1 + conv_gamma(actv)) + conv_beta(actv)

is the traffic hot spot of full-res inference: XLA materializes ``actv``
(B*H*W*128), reads it twice (gamma and beta convs), and materializes both
modulation maps before the elementwise epilogue — ~6 GB of HBM round trips per
norm at 1024x768 b4, and its spatial convs at these channel counts run far off
the MXU roofline (ROADMAP.md §1: ~18 ms XLA-effective per norm vs a ~4 ms
traffic bound). Per-op Pallas conv replacement was measured to LOSE here
because each replaced conv forfeits XLA's elementwise fusion (ROADMAP.md §1);
only fusing the *whole chain* wins.

This kernel computes gamma and beta as 9-tap aligned MXU matmuls over one
double-buffered row-band stream of ``actv`` (same DMA/rotate structure as
ops/conv3x3.py, the formulation that survived round 1's Mosaic hazards) and
applies the normalize+modulate epilogue in-register:
  * ``actv`` is read from HBM exactly once (vs 1 write + 2 reads),
  * gamma/beta are never materialized,
  * ``normalized`` is never materialized (mu/rsig come in as per-(batch,
    channel) scalars; the noise-add is recomputed in-kernel from the
    (B,H,W,1) noise field).
Only the instance-norm statistics pass (one fused XLA reduction over x) and
the cheap 7->128 conv_shared remain outside.

Numerics match the unfused path: conv taps accumulate in f32 and round once
to bf16 (exactly XLA's MXU conv contract), the stats/normalize math is f32,
and the epilogue reproduces the reference's bf16 elementwise dtype chain.

Training: `fused_spade_modulate` carries a custom VJP whose backward is XLA
autodiff of the reference formulation, so enabling it under jax.grad is safe;
the kernel only accelerates the forward.
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

from hrviton_tpu.ops.conv3x3 import _roll_cols

__all__ = ["fused_spade_modulate", "fused_spade_eligible",
           "enable_fast_spade", "fast_spade_enabled", "fast_spade"]

_TH = 16
# rows per grid step. The compiler's default 16M scoped-VMEM cap is far below
# the chip's physical VMEM; the pallas_call raises it (vmem_limit_bytes) and
# a taller tile amortizes per-grid-step overhead, which dominated at TH=4
# (1024 steps for a b4 1024x768 norm measured the same 20.5 ms as TH=8's
# 512 — the MXU/VPU work is only ~7 ms of it). Tests/experiments with tiny
# shapes retune via set_tile_rows().
_ENABLED = False
_MIN_H = 256
_INTERPRET = bool(int(os.environ.get("HRVITON_PALLAS_INTERPRET", "0")))
_EPS = 1e-5


def set_tile_rows(th: int) -> None:
    """Retune the kernel's rows-per-grid-step (tests/experiments only)."""
    global _TH
    _TH = int(th)


def enable_fast_spade(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def fast_spade_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def fast_spade(on: bool = True):
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(on)
    try:
        yield
    finally:
        _ENABLED = prev


def fused_spade_eligible(x_shape, nhidden: int, dtype) -> bool:
    """Static dispatch test for the fused kernel."""
    if not _ENABLED:
        return False
    n, h, w, c = x_shape
    # Correctness gates (hold in interpret mode too): the grid truncates at
    # h % _TH, and h == _TH would fire both boundary branches on one step.
    if not (h % _TH == 0 and w % 8 == 0 and h > _TH):
        return False
    # actv rows are manually DMA'd: minor dim must be lane-tile aligned.
    if nhidden % 128 != 0:
        return False
    if _INTERPRET:
        return True
    if jax.default_backend() == "cpu":
        return False
    if dtype != jnp.bfloat16:
        return False
    # VMEM plan: actv double-buffer + ky-merged row bands + the f32
    # accumulator + the pipeline's double-buffered x/out blocks (lane-padded)
    # + merged weights. Keep comfortably under the 16M scoped limit.
    cpad = ((c + 127) // 128) * 128
    vmem = (2 * (_TH + 2) * w * nhidden * 2      # actv tile (bf16)
            + _TH * w * 3 * nhidden * 2          # rows3 (bf16)
            + _TH * w * 2 * cpad * 4             # merged gamma|beta acc (f32)
            + 2 * 2 * _TH * w * cpad * 2         # x + out blocks, 2-buffered
            + 2 * 3 * 3 * nhidden * 2 * cpad * 2)  # wgb, 2-buffered
    if vmem > 60 * 2 ** 20:    # vmem_limit_bytes=100M; stay well inside
        return False
    # Below ~256x192 XLA's fusion wins (same crossover as ops/conv3x3.py).
    # _MIN_H is a module constant experiments may raise to restrict dispatch
    # to specific pyramid scales (e.g. 1024 -> up_4's norms only).
    return h >= _MIN_H and w >= 96


def _kernel(actv_hbm, x_ref, noise_ref, nsc_ref, mu_ref, rsig_ref,
            wgb_ref, bg_ref, bb_ref, o_ref, tile, sem):
    # actv_hbm: (B, H, W, NH) in ANY (pre-relu conv_shared output);
    # x_ref: (1, TH, W, C); noise_ref: (1, 1, TH, W) f32 from a
    # (B, H/TH, TH, W) view — lanes on W (a (.., W, 1) block would lane-pad
    # 1->128 and cost 128x the VMEM) with trailing block dims equal to the
    # array dims (Mosaic block-mapping rule at TH<8); nsc/mu/rsig/bg/bb:
    # (1, 1, C) f32; wgb: (3, 3*NH, 2*cpad) — per-kx merged-ky weights with
    # gamma in lanes [:cpad] and beta in [cpad:]; o_ref: (1, TH, W, C);
    # tile: (2, TH+2, W, NH) double buffer.
    # nsc/mu/rsig/bg/bb arrive as (1, 1, C) blocks — the leading singleton
    # keeps the trailing two block dims equal to the array dims (a Mosaic
    # block-mapping requirement for C not divisible by 128).
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    cout = o_ref.shape[-1]
    n_i = pl.num_programs(1)

    def fetch(slot, idx, start):
        # Row-band [idx*TH-1, idx*TH+TH+1) with edge clamping; the wait must
        # reuse the same descriptor shape (semaphore counts bytes).
        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(actv_hbm.at[b, pl.ds(0, th + 1)],
                                       tile.at[slot, pl.ds(1, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                tile.at[slot], sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == n_i - 1)
        def _():
            cp = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                tile.at[slot, pl.ds(0, th + 1)], sem.at[slot])
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

    # The 3 ky taps are merged into the contraction dim (K = 3*NH) and gamma
    # plus beta into one lane-padded output (N = 2*ceil128(C)): 3 MXU dots +
    # 2 product rolls per tile instead of 18 dots + 18 f32 roll/where/add
    # chains — the VPU epilogue, not the MXU, dominated the unmerged form.
    nh = tile.shape[-1]
    cpad = wgb_ref.shape[-1] // 2
    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    rows3 = jnp.concatenate(
        [jax.nn.relu(tile[pl.ds(slot, 1), ky:ky + th][0]) for ky in range(3)],
        axis=-1)                                       # (TH, W, 3*NH)
    acc = jnp.zeros((th, wv, 2 * cpad), jnp.float32)
    for kx in range(3):
        p = lax.dot_general(rows3, wgb_ref[kx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = acc + _roll_cols(p, kx, wv, col)

    dtype = o_ref.dtype
    # conv output dtype chain parity: f32 accumulate -> one bf16 round ->
    # bf16 bias add (nn/layers.py _ConvCore).
    gamma = acc[..., :cout].astype(dtype) + bg_ref[0].astype(dtype)
    beta = acc[..., cpad:cpad + cout].astype(dtype) + bb_ref[0].astype(dtype)
    # noise add in the input dtype, stats/normalize in f32, output in dtype
    # (models/spade.py SPADENorm + nn/layers.py InstanceNorm2d parity).
    xn = x_ref[0] + (noise_ref[0, 0][:, :, None] * nsc_ref[0]).astype(dtype)
    normalized = ((xn.astype(jnp.float32) - mu_ref[0]) *
                  rsig_ref[0]).astype(dtype)
    o_ref[0] = normalized * (1.0 + gamma) + beta


def _modulate_pallas(x, noise, nscale, actv, wg, bg, wb, bb):
    n, h, w, c = x.shape
    nh = actv.shape[-1]
    # Instance-norm statistics of xn, computed by one fused XLA reduction
    # (reads x once; xn itself is never materialized — the kernel recomputes
    # the noise add per tile).
    xnf = (x + (noise * nscale).astype(x.dtype)).astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2))                              # (B, C)
    var = jnp.mean(jnp.square(xnf - mu[:, None, None, :]), axis=(1, 2))
    rsig = lax.rsqrt(var + _EPS)

    # Merged weight layout (3_kx, 3_ky*NH, 2*cpad): K-merged over ky (matches
    # the kernel's lane-concat of the three row bands), N-merged gamma|beta
    # at 128-aligned lane offsets so the kernel's splits stay aligned.
    cpad = ((c + 127) // 128) * 128

    def halfw(w_):
        wt = w_.transpose(1, 0, 2, 3).reshape(3, 3 * nh, c)   # (kx, ky*NH, C)
        return jnp.pad(wt, ((0, 0), (0, 0), (0, cpad - c)))
    wgb = jnp.concatenate([halfw(wg), halfw(wb)], axis=-1).astype(x.dtype)
    # (B, 1, C)/(1, 1, C) shapes for the small vectors: Mosaic requires the
    # trailing two block dims be (8, 128)-divisible or equal to the array
    # dims, which (1, C<128-misaligned) with a B-indexed leading dim is not.
    vec = lambda a: a.reshape(1, 1, c).astype(jnp.float32)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n, h // _TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # actv
            pl.BlockSpec((1, _TH, w, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, _TH, w), lambda b, i: (b, i, 0, 0)),  # noise
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0)),      # nscale
            pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),      # mu
            pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),      # rsig
            pl.BlockSpec((3, 3 * nh, 2 * cpad),
                         lambda b, i: (0, 0, 0)),                 # wgb
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0)),      # bg
            pl.BlockSpec((1, 1, c), lambda b, i: (0, 0, 0)),      # bb
        ],
        out_specs=pl.BlockSpec((1, _TH, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, _TH + 2, w, nh), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_INTERPRET,
    )(actv, x,
      noise.reshape(n, h // _TH, _TH, w).astype(jnp.float32), vec(nscale),
      mu.reshape(n, 1, c), rsig.reshape(n, 1, c), wgb, vec(bg), vec(bb))


def _modulate_ref(x, noise, nscale, actv, wg, bg, wb, bb):
    """XLA formulation with identical numerics (backward pass + CPU)."""
    dtype = x.dtype
    xn = x + (noise * nscale).astype(dtype)
    xnf = xn.astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xnf - mu), axis=(1, 2), keepdims=True)
    normalized = ((xnf - mu) * lax.rsqrt(var + _EPS)).astype(dtype)
    a = jax.nn.relu(actv)
    dn = lax.conv_dimension_numbers(a.shape, wg.shape, ("NHWC", "HWIO", "NHWC"))
    gamma = lax.conv_general_dilated(a, wg.astype(dtype), (1, 1),
                                     ((1, 1), (1, 1)), dimension_numbers=dn)
    gamma = gamma + bg.astype(dtype)
    beta = lax.conv_general_dilated(a, wb.astype(dtype), (1, 1),
                                    ((1, 1), (1, 1)), dimension_numbers=dn)
    beta = beta + bb.astype(dtype)
    return normalized * (1.0 + gamma) + beta


@jax.custom_vjp
def fused_spade_modulate(x, noise, nscale, actv, wg, bg, wb, bb):
    """instance_norm(x + noise*nscale) * (1 + conv(relu(actv), wg) + bg)
    + conv(relu(actv), wb) + bb — single-pass Pallas kernel when eligible.

    x: (N, H, W, C); noise: (N, H, W, 1) f32; nscale: (C,) f32;
    actv: (N, H, W, NH) pre-relu; wg/wb: (3, 3, NH, C) HWIO; bg/bb: (C,).
    Call ``fused_spade_eligible(x.shape, NH, x.dtype)`` before dispatching.
    """
    return _modulate_pallas(x, noise, nscale, actv, wg, bg, wb, bb)


def _fwd(x, noise, nscale, actv, wg, bg, wb, bb):
    out = _modulate_pallas(x, noise, nscale, actv, wg, bg, wb, bb)
    return out, (x, noise, nscale, actv, wg, bg, wb, bb)


def _bwd(res, g):
    _, vjp = jax.vjp(_modulate_ref, *res)
    return vjp(g)


fused_spade_modulate.defvjp(_fwd, _bwd)
