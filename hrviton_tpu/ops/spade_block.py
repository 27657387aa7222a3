"""Pallas TPU kernel: fused {SPADE-norm -> activation -> consumer conv} unit.

ROADMAP §1's stated win condition for the full-res SPADE stack. The per-norm
fused kernel (ops/spade_fused.py) wins ~3 ms isolated at up_4 shapes but
LOSES composed (15.7 vs 17.2 img/s): its output feeds an XLA conv, and that
boundary forfeits the producer-into-conv fusion XLA builds for the unfused
chain. This kernel erases the boundary by consuming the modulated output
into the block's own conv inside the same pass:

    xn         = x + noise * noise_scale        # fused XLA elementwise,
    mu, rsig   = instance stats of xn           # outside (one pass over xn)
    actv       = conv_shared(seg)               # outside (7->128, pre-relu)
    ---------------------------------------------- in-kernel, one band pass:
    normalized = (xn - mu) * rsig
    mod        = normalized * (1 + conv_g(relu(actv))) + conv_b(relu(actv))
    out        = conv(act(mod), Wc) + bias [+ residual]

Per grid step: one DMA'd row band of xn and actv, gamma|beta as ky-merged
MXU dots (K = 3*NH, N = gamma|beta lane-merged), the modulate epilogue
in-register, the modulated band stored to a VMEM scratch ref, and the
consumer 3x3 conv as ky-merged dots over ref-sliced bands (K = 3*C) with
pltpu.roll f32 product shifts — the formulations that survived round-1
Mosaic hazards in ops/conv3x3.py and ops/spade_fused.py (ref slicing,
128-lane manual DMA, f32 rolls; see .claude/skills/verify/SKILL.md).

Interface contract: xn and the returned out are **lane-padded to a 128
multiple** (zero pad) so the manual DMAs are lane-aligned and chained units
(norm_0->conv_0 feeding norm_1->conv_1) stay padded end-to-end with no
repacking. Zero padding is exact end-to-end: padded xn channels are zero,
mu/rsig/weights pad with zeros, so padded modulated lanes and padded conv
in/out lanes stay zero.

Numerics match the unfused reference: conv taps accumulate in f32 and round
once to the compute dtype (the MXU conv contract), stats/normalize math in
f32, elementwise chain in the compute dtype.

Reference: SPADEResBlock (/root/reference/network_generator.py:125-173);
one call fuses one of its three {SPADENorm, conv} pairs.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrviton_tpu.ops.conv3x3 import _roll_cols

__all__ = ["fused_spade_conv", "spade_conv_ref", "spade_conv_unit",
           "spade_conv_stats", "pad_lanes", "unpad_lanes",
           "fused_spade_conv_eligible"]

_TH = 8
_MIN_H = 256     # experiments may raise to restrict dispatch to one scale
_PIPELINED = True   # 3x3 consumers use the software-pipelined kernel
_INTERPRET = bool(int(os.environ.get("HRVITON_PALLAS_INTERPRET", "0")))
_EPS = 1e-5
_LANE = 128


def _ceil_lane(c: int) -> int:
    return ((c + _LANE - 1) // _LANE) * _LANE


def pad_lanes(x, c_to: int = 0):
    """Zero-pad the channel (lane) dim to a 128 multiple."""
    c = x.shape[-1]
    c_to = c_to or _ceil_lane(c)
    if c == c_to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, c_to - c)])


def unpad_lanes(x, c: int):
    return x if x.shape[-1] == c else x[..., :c]


def _act(x, kind):
    if kind is None:
        return x
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "leaky0.2":
        # max(x, 0.2x) == leaky_relu(x, 0.2) exactly (0 < alpha < 1), and
        # avoids where(x >= 0, ...): Mosaic rejects bf16 vector compares
        # ("Target does not support this comparison") while max lowers fine.
        return jnp.maximum(x, 0.2 * x)
    raise ValueError(kind)


def fused_spade_conv_eligible(h, w, nh, dtype) -> bool:
    """Static shape gate (mirrors ops/spade_fused.py constraints)."""
    if not (h % _TH == 0 and w % _LANE == 0 and h > _TH):
        return False
    if nh % _LANE:
        return False
    if _INTERPRET:
        return True
    if jax.default_backend() == "cpu":
        return False
    return dtype == jnp.bfloat16 and h >= _MIN_H


def _kernel(xn_hbm, actv_hbm, mu_ref, rsig_ref, wgb_ref, bgb_ref,
            wc_ref, bc_ref, res_ref, o_ref, xt, at, mref, sem,
            *, ksize, pre_act, has_res):
    # xn_hbm: (B, H, W, CP) compute dtype (x + noise*nscale, lane-padded);
    # actv_hbm: (B, H, W, NH) pre-relu; mu/rsig: (B, 1, CP) f32;
    # wgb: (3_kx, 3_ky*NH, 2*CP) gamma|beta merged; bgb: (1, 1, 2*CP) f32;
    # wc: (3_kx, 3_ky*C, COP) or (1, C, COP); bc: (1, COP) f32;
    # res/o: (1, TH, W, COP) blocks.
    # Scratch: xt (2, TH+2, W, CP), at (2, TH+4, W, NH), mref (TH+2, W, C),
    # sem (2 streams, 2 slots).
    # Band row maps for grid step i: modulated rows [i*TH-1, (i+1)*TH+1)
    # (xt band, TH+2), each needing actv rows +-1 more (at band, TH+4).
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    n_i = pl.num_programs(1)
    h = n_i * th

    def fetch_band(hbm, dst, stream, slot, idx, start, halo):
        """Rows [idx*th - halo, (idx+1)*th + halo) clamped to [0, h). Each
        pl.when arm keeps one static descriptor shape so the wait matches
        its start (the DMA semaphore counts bytes)."""
        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(idx * th - halo, th + 2 * halo)],
                dst.at[slot], sem.at[stream, slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(0, th + halo)],
                dst.at[slot, pl.ds(halo, th + halo)], sem.at[stream, slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx == n_i - 1, idx > 0))
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(idx * th - halo, th + halo)],
                dst.at[slot, pl.ds(0, th + halo)], sem.at[stream, slot])
            cp.start() if start else cp.wait()

    def fetch(slot, idx, start):
        fetch_band(xn_hbm, xt, 0, slot, idx, start, 1)
        fetch_band(actv_hbm, at, 1, slot, idx, start, 2)

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)

    @pl.when(i + 1 < n_i)
    def _():
        fetch((i + 1) % 2, i + 1, True)

    slot = i % 2
    fetch(slot, i, False)

    # zero off-image actv rows (the gamma/beta convs' zero-padding)
    nh = at.shape[-1]

    @pl.when(i == 0)
    def _():
        at[slot, 0] = jnp.zeros((wv, nh), at.dtype)
        at[slot, 1] = jnp.zeros((wv, nh), at.dtype)

    @pl.when(i == n_i - 1)
    def _():
        at[slot, th + 2] = jnp.zeros((wv, nh), at.dtype)
        at[slot, th + 3] = jnp.zeros((wv, nh), at.dtype)

    dtype = o_ref.dtype
    cp = xt.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)

    # ---- gamma|beta for the TH+2 modulated rows: ky lane-merged actv bands
    # (mod band row q needs actv band rows q..q+2), 3 kx dots + f32 rolls.
    # N is TIGHT-packed: gamma at lanes [0, C), beta at [C, 2C) — for C=32
    # the dot's padded N is 128 instead of the 256 a per-half-128-padded
    # layout costs. The non-128-aligned value slices below compile to lane
    # shuffles (it's SUBLANE value slicing that hangs Mosaic, not lane).
    ngb = wgb_ref.shape[-1]          # == 2*C
    ctrue = ngb // 2
    rows3a = jnp.concatenate(
        [jax.nn.relu(at[pl.ds(slot, 1), ky:ky + th + 2][0])
         for ky in range(3)], axis=-1)                    # (TH+2, W, 3NH)
    gb = jnp.zeros((th + 2, wv, ngb), jnp.float32)
    for kx in range(3):
        p = lax.dot_general(rows3a, wgb_ref[kx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        gb = gb + _roll_cols(p, kx, wv, col)
    gbd = gb.astype(dtype) + bgb_ref[0, 0].astype(dtype)
    gamma = gbd[..., :ctrue]
    beta = gbd[..., ctrue:2 * ctrue]
    if ctrue != cp:
        gamma = jnp.pad(gamma, ((0, 0), (0, 0), (0, cp - ctrue)))
        beta = jnp.pad(beta, ((0, 0), (0, 0), (0, cp - ctrue)))

    # ---- normalize + modulate the band (f32 stats math, dtype elementwise)
    xb = xt[pl.ds(slot, 1)][0]                            # (TH+2, W, CP)
    normalized = ((xb.astype(jnp.float32) - mu_ref[0]) *
                  rsig_ref[0]).astype(dtype)
    mref[...] = normalized * (1.0 + gamma) + beta

    # zero off-image modulated rows == the consumer conv's zero padding
    # (the band's edge rows came from stale/clamped DMA rows; act(0) == 0
    # for relu/leaky so the conv sees exactly XLA's pad)
    @pl.when(i == 0)
    def _():
        mref[0] = jnp.zeros((wv, cp), dtype)

    @pl.when(i == n_i - 1)
    def _():
        mref[th + 1] = jnp.zeros((wv, cp), dtype)

    # ---- consumer conv over the modulated band: ky lane-merged ref slices
    # (K over the padded channels — pad lanes zero, matching wc rows zero)
    # AND kx lane-merged output (ONE dot with N = 3*cout, lane groups rolled
    # and summed) — a third of the MXU passes of per-kx dots.
    if ksize == 3:
        rows3m = jnp.concatenate(
            [_act(mref[ky:ky + th], pre_act) for ky in range(3)],
            axis=-1)                                      # (TH, W, 3*CP)
        cout = wc_ref.shape[-1] // 3
        p = lax.dot_general(rows3m, wc_ref[0],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = jnp.zeros((th, wv, cout), jnp.float32)
        for kx in range(3):
            acc = acc + _roll_cols(p[..., kx * cout:(kx + 1) * cout],
                                   kx, wv, col)
    else:
        cout = wc_ref.shape[-1]
        rows = _act(mref[1:th + 1], pre_act)              # center TH rows
        acc = lax.dot_general(rows, wc_ref[0],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = acc.astype(dtype) + bc_ref[0].astype(dtype)
    cop = o_ref.shape[-1]
    if cout != cop:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, cop - cout)))
    if has_res:
        out = out + res_ref[0]
    o_ref[0] = out


def _pipe_lag(ksize: int) -> int:
    """Pipeline depth: the 3x3 consumer needs bands j-1..j+1 resident
    (lag 2, ring 4); the 1x1 consumer needs only band j (lag 1, ring 2)."""
    return 2 if ksize == 3 else 1


def _kernel_pipe(xn_hbm, actv_hbm, mu_ref, rsig_ref, wgb_ref, bgb_ref,
                 wc_ref, bc_ref, res_ref, o_ref, xt, at, ring, sem,
                 *, ksize, pre_act, has_res):
    """Software-pipelined variant: the PRODUCER stage (gamma|beta dots +
    modulate) fills band i of a VMEM ring while the CONSUMER stage (the
    conv) drains block j = i - lag, whose input bands were all written
    >= 1 step ago — the two stages share no data within a step, so
    Mosaic's scheduler can interleave one stage's MXU dots with the
    other's VPU rolls/epilogues. _kernel (v1) serializes gb -> modulate ->
    conv inside each step and measured ~2x its MXU floor (26.6 vs 20.5 ms
    pipelined at up_4 n0, tools/exp_spade_block.py round 4).

    Bands are TH-row ALIGNED (no xn halo: the 3x3 conv's +-1 rows come
    from neighbouring ring slots); grid dim 1 runs n_i + lag steps.
    Off-image rows (the conv's zero padding) are handled by zeroing one
    ring row before each edge consumer step.
    """
    lag = _pipe_lag(ksize)
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    n_i = pl.num_programs(1) - lag
    ns = ring.shape[0]
    dtype = o_ref.dtype
    cp = ring.shape[-1]
    ngb = wgb_ref.shape[-1]
    ctrue = ngb // 2
    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    nh = at.shape[-1]

    def fetch(slot, idx, start):
        @pl.when(idx < n_i)
        def _():
            cx = pltpu.make_async_copy(xn_hbm.at[b, pl.ds(idx * th, th)],
                                       xt.at[slot], sem.at[0, slot])
            cx.start() if start else cx.wait()

        # actv band [idx*th - 1, (idx+1)*th + 1), edge-clamped
        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                at.at[slot], sem.at[1, slot])
            ca.start() if start else ca.wait()

        @pl.when(idx == 0)
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(0, th + 1)],
                at.at[slot, pl.ds(1, th + 1)], sem.at[1, slot])
            ca.start() if start else ca.wait()

        @pl.when(jnp.logical_and(idx == n_i - 1, idx > 0))
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                at.at[slot, pl.ds(0, th + 1)], sem.at[1, slot])
            ca.start() if start else ca.wait()

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)
        if ksize == 3:
            # mod row -1 (zero padding) for the j=0 consumer's ky=0 band:
            # slot ns-1 is not produced until band ns-1 at step ns-1 > lag
            ring[ns - 1, th - 1] = jnp.zeros((wv, cp), dtype)

    @pl.when(jnp.logical_and(i + 1 < n_i, True))
    def _():
        fetch((i + 1) % 2, i + 1, True)

    # ---------------------------------------------------------- producer --
    @pl.when(i < n_i)
    def _():
        slot = i % 2
        fetch(slot, i, False)

        @pl.when(i == 0)
        def _():
            at[slot, 0] = jnp.zeros((wv, nh), at.dtype)

        @pl.when(i == n_i - 1)
        def _():
            at[slot, th + 1] = jnp.zeros((wv, nh), at.dtype)

        rows3a = jnp.concatenate(
            [jax.nn.relu(at[pl.ds(slot, 1), ky:ky + th][0])
             for ky in range(3)], axis=-1)                 # (TH, W, 3NH)
        gb = jnp.zeros((th, wv, ngb), jnp.float32)
        for kx in range(3):
            p = lax.dot_general(rows3a, wgb_ref[kx],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            gb = gb + _roll_cols(p, kx, wv, col)
        gbd = gb.astype(dtype) + bgb_ref[0, 0].astype(dtype)
        gamma = gbd[..., :ctrue]
        beta = gbd[..., ctrue:2 * ctrue]
        if ctrue != cp:
            gamma = jnp.pad(gamma, ((0, 0), (0, 0), (0, cp - ctrue)))
            beta = jnp.pad(beta, ((0, 0), (0, 0), (0, cp - ctrue)))
        xb = xt[pl.ds(i % 2, 1)][0]                        # (TH, W, CP)
        normalized = ((xb.astype(jnp.float32) - mu_ref[0]) *
                      rsig_ref[0]).astype(dtype)
        ring[i % ns] = normalized * (1.0 + gamma) + beta

    if ksize == 3:
        # last consumer's ky=2 band tail: mod row H (zero padding). Slot
        # n_i%ns holds dead band n_i-ns (all its consumers have run).
        @pl.when(i == n_i + lag - 1)
        def _():
            ring[n_i % ns, 0] = jnp.zeros((wv, cp), dtype)

    # ---------------------------------------------------------- consumer --
    @pl.when(i >= lag)
    def _():
        j = i - lag
        jj = j % ns
        if ksize == 3:
            jm1 = (j - 1) % ns
            jp1 = (j + 1) % ns
            band0 = jnp.concatenate([ring[pl.ds(jm1, 1), th - 1:th][0],
                                     ring[pl.ds(jj, 1), 0:th - 1][0]],
                                    axis=0)
            band1 = ring[pl.ds(jj, 1)][0]
            band2 = jnp.concatenate([ring[pl.ds(jj, 1), 1:th][0],
                                     ring[pl.ds(jp1, 1), 0:1][0]], axis=0)
            rows3m = jnp.concatenate(
                [_act(bd, pre_act) for bd in (band0, band1, band2)],
                axis=-1)                                   # (TH, W, 3CP)
            cout = wc_ref.shape[-1] // 3
            p = lax.dot_general(rows3m, wc_ref[0],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = jnp.zeros((th, wv, cout), jnp.float32)
            for kx in range(3):
                acc = acc + _roll_cols(p[..., kx * cout:(kx + 1) * cout],
                                       kx, wv, col)
        else:
            cout = wc_ref.shape[-1]
            rows = _act(ring[pl.ds(jj, 1)][0], pre_act)
            acc = lax.dot_general(rows, wc_ref[0],
                                  dimension_numbers=(((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = acc.astype(dtype) + bc_ref[0].astype(dtype)
        cop = o_ref.shape[-1]
        if cout != cop:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, cop - cout)))
        if has_res:
            out = out + res_ref[0]
        o_ref[0] = out


def fused_spade_conv(xn_pad, mu, rsig, actv, wg, bg, wb, bb, wc, bc,
                     *, c: int, pre_act=None, residual=None):
    """Fused SPADE-norm + consumer conv unit (see module docstring).

    xn_pad: (B, H, W, CP) compute dtype — x + noise*nscale with the channel
      dim zero-padded from the true `c` to CP (128 multiple);
    mu/rsig: (B, c) f32 instance stats of xn (use spade_conv_stats);
    actv: (B, H, W, NH) PRE-relu conv_shared output, NH % 128 == 0;
    wg/wb: (3, 3, NH, c) HWIO modulation kernels; bg/bb: (c,);
    wc: (3, 3, c, cout) or (1, 1, c, cout) consumer kernel; bc: (cout,)/None;
    pre_act: None | 'relu' | 'leaky0.2' between the norm and the conv;
    residual: optional (B, H, W, COP) added to the conv output (pre-padded).
    Returns (B, H, W, COP), COP = 128-padded cout, pad lanes zero.
    """
    n, h, w, cpad = xn_pad.shape
    nh = actv.shape[-1]
    cout = wc.shape[-1]
    cop = _ceil_lane(cout)
    ksize = wc.shape[0]
    assert cpad == _ceil_lane(c), (cpad, c)
    assert h % _TH == 0 and h > _TH and w % _LANE == 0 and nh % _LANE == 0

    mu = jnp.pad(mu.astype(jnp.float32), ((0, 0), (0, cpad - c)))
    rsig = jnp.pad(rsig.astype(jnp.float32), ((0, 0), (0, cpad - c)))

    # wgb: (3_kx, 3_ky*NH, 2C) — TIGHT gamma|beta lanes [0:C) | [C:2C)
    def halfw(w_):
        return w_.transpose(1, 0, 2, 3).reshape(3, 3 * nh, c)
    wgb = jnp.concatenate([halfw(wg), halfw(wb)],
                          axis=-1).astype(xn_pad.dtype)
    bgb = jnp.concatenate([bg.astype(jnp.float32),
                           bb.astype(jnp.float32)])

    # consumer kernel: K padded to match mref's lane concat (row index =
    # ky*CP + cin, pad rows zero); N = kx lane groups, TIGHT cout each
    wcp = jnp.pad(wc, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
    if ksize == 3:
        wck = jnp.concatenate(
            [wcp[:, kx].reshape(3 * cpad, cout)
             for kx in range(3)], axis=-1).reshape(1, 3 * cpad, 3 * cout)
    else:
        wck = wcp.reshape(1, cpad, cout)
    wck = wck.astype(xn_pad.dtype)
    bck = jnp.zeros((cout,), jnp.float32) if bc is None else bc
    bck = bck.astype(jnp.float32).reshape(1, cout)

    has_res = residual is not None
    res = residual if has_res else jnp.zeros((1, 1, 1, 1), xn_pad.dtype)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((n, h, w, cop), xn_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_INTERPRET,
    )
    args = (xn_pad, actv, mu.reshape(n, 1, cpad), rsig.reshape(n, 1, cpad),
            wgb, bgb.reshape(1, 1, 2 * c), wck, bck, res)

    if _PIPELINED:
        n_i = h // _TH
        lag = _pipe_lag(ksize)
        lagged = lambda b, i: (b, jnp.clip(i - lag, 0, n_i - 1), 0, 0)
        res_spec = (pl.BlockSpec((1, _TH, w, cop), lagged) if has_res
                    else pl.BlockSpec((1, 1, 1, 1),
                                      lambda b, i: (0, 0, 0, 0)))
        return pl.pallas_call(
            partial(_kernel_pipe, ksize=ksize, pre_act=pre_act,
                    has_res=has_res),
            grid=(n, n_i + lag),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),                  # xn_pad
                pl.BlockSpec(memory_space=pl.ANY),                  # actv
                pl.BlockSpec((1, 1, cpad), lambda b, i: (b, 0, 0)),  # mu
                pl.BlockSpec((1, 1, cpad), lambda b, i: (b, 0, 0)),  # rsig
                pl.BlockSpec((3, 3 * nh, 2 * c), lambda b, i: (0, 0, 0)),
                pl.BlockSpec((1, 1, 2 * c), lambda b, i: (0, 0, 0)),  # bgb
                pl.BlockSpec(wck.shape, lambda b, i: (0,) * 3),     # wc
                pl.BlockSpec((1, cout), lambda b, i: (0, 0)),       # bc
                res_spec,
            ],
            out_specs=pl.BlockSpec((1, _TH, w, cop), lagged,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _TH, w, cpad), xn_pad.dtype),        # xt
                pltpu.VMEM((2, _TH + 2, w, nh), xn_pad.dtype),      # at
                pltpu.VMEM((lag + 2 if ksize == 3 else 2,
                            _TH, w, cpad), xn_pad.dtype),           # ring
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            **common,
        )(*args)

    res_spec = (pl.BlockSpec((1, _TH, w, cop), lambda b, i: (b, i, 0, 0))
                if has_res
                else pl.BlockSpec((1, 1, 1, 1), lambda b, i: (0, 0, 0, 0)))
    return pl.pallas_call(
        partial(_kernel, ksize=ksize, pre_act=pre_act, has_res=has_res),
        grid=(n, h // _TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # xn_pad
            pl.BlockSpec(memory_space=pl.ANY),                  # actv
            pl.BlockSpec((1, 1, cpad), lambda b, i: (b, 0, 0)),  # mu
            pl.BlockSpec((1, 1, cpad), lambda b, i: (b, 0, 0)),  # rsig
            pl.BlockSpec((3, 3 * nh, 2 * c), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda b, i: (0, 0, 0)),  # bgb
            pl.BlockSpec(wck.shape, lambda b, i: (0,) * 3),     # wc
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),       # bc
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, _TH, w, cop), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _TH + 2, w, cpad), xn_pad.dtype),    # xt
            pltpu.VMEM((2, _TH + 4, w, nh), xn_pad.dtype),      # at
            pltpu.VMEM((_TH + 2, w, cpad), xn_pad.dtype),       # mref
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        **common,
    )(*args)


def spade_conv_stats(xn, c: int):
    """Per-(batch, channel) instance stats of the (possibly padded) xn;
    returns (mu, rsig) over the TRUE channels c, f32, one fused pass."""
    xnf = xn[..., :c].astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2))
    var = jnp.mean(jnp.square(xnf - mu[:, None, None, :]), axis=(1, 2))
    return mu, lax.rsqrt(var + _EPS)


def _unit_ref_padded(c, pre_act, xn_pad, actv, wg, bg, wb, bb, wc, bc,
                     residual):
    """XLA formulation of the unit on the PADDED interface — identical
    numerics to the kernel (backward pass + ineligible shapes)."""
    dtype = xn_pad.dtype
    xnf = xn_pad[..., :c].astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xnf - mu), axis=(1, 2), keepdims=True)
    normalized = ((xnf - mu) * lax.rsqrt(var + _EPS)).astype(dtype)
    a = jax.nn.relu(actv)
    dn = lax.conv_dimension_numbers(a.shape, wg.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    gamma = lax.conv_general_dilated(a, wg.astype(dtype), (1, 1),
                                     ((1, 1), (1, 1)),
                                     dimension_numbers=dn) + bg.astype(dtype)
    beta = lax.conv_general_dilated(a, wb.astype(dtype), (1, 1),
                                    ((1, 1), (1, 1)),
                                    dimension_numbers=dn) + bb.astype(dtype)
    mod = _act(normalized * (1.0 + gamma) + beta, pre_act)
    ks = wc.shape[0]
    pad = 1 if ks == 3 else 0
    dn2 = lax.conv_dimension_numbers(mod.shape, wc.shape,
                                     ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(mod, wc.astype(dtype), (1, 1),
                                 ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn2)
    y = pad_lanes(y + bc.astype(y.dtype))
    if residual is not None:
        y = y + residual
    return y


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def spade_conv_unit(c, pre_act, xn_pad, actv, wg, bg, wb, bb, wc, bc,
                    residual=None):
    """Differentiable fused unit: Pallas forward, XLA-autodiff backward of
    the identical reference formulation. Dispatch on eligibility BEFORE
    calling (fused_spade_conv_eligible); bc must be an array (zeros for a
    bias-free conv — its grad is simply unused)."""
    mu, rsig = spade_conv_stats(xn_pad, c)
    return fused_spade_conv(xn_pad, mu, rsig, actv, wg, bg, wb, bb, wc, bc,
                            c=c, pre_act=pre_act, residual=residual)


def _unit_fwd(c, pre_act, xn_pad, actv, wg, bg, wb, bb, wc, bc, residual):
    out = spade_conv_unit(c, pre_act, xn_pad, actv, wg, bg, wb, bb, wc, bc,
                          residual)
    return out, (xn_pad, actv, wg, bg, wb, bb, wc, bc, residual)


def _unit_bwd(c, pre_act, res, g):
    (xn_pad, actv, wg, bg, wb, bb, wc, bc, residual) = res
    if residual is None:
        _, vjp = jax.vjp(lambda *a: _unit_ref_padded(c, pre_act, *a, None),
                         xn_pad, actv, wg, bg, wb, bb, wc, bc)
        return (*vjp(g), None)
    _, vjp = jax.vjp(partial(_unit_ref_padded, c, pre_act),
                     xn_pad, actv, wg, bg, wb, bb, wc, bc, residual)
    return vjp(g)


spade_conv_unit.defvjp(_unit_fwd, _unit_bwd)


def spade_conv_ref(x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
                   pre_act=None, residual=None):
    """XLA formulation with identical numerics (unpadded true channels)."""
    dtype = x.dtype
    xn = x + (noise * nscale).astype(dtype)
    xnf = xn.astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xnf - mu), axis=(1, 2), keepdims=True)
    normalized = ((xnf - mu) * lax.rsqrt(var + _EPS)).astype(dtype)
    a = jax.nn.relu(actv)
    dn = lax.conv_dimension_numbers(a.shape, wg.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    gamma = lax.conv_general_dilated(a, wg.astype(dtype), (1, 1),
                                     ((1, 1), (1, 1)),
                                     dimension_numbers=dn) + bg.astype(dtype)
    beta = lax.conv_general_dilated(a, wb.astype(dtype), (1, 1),
                                    ((1, 1), (1, 1)),
                                    dimension_numbers=dn) + bb.astype(dtype)
    mod = _act(normalized * (1.0 + gamma) + beta, pre_act)
    ks = wc.shape[0]
    pad = 1 if ks == 3 else 0
    dn2 = lax.conv_dimension_numbers(mod.shape, wc.shape,
                                     ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(mod, wc.astype(dtype), (1, 1),
                                 ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn2)
    if bc is not None:
        y = y + bc.astype(y.dtype)
    if residual is not None:
        y = y + residual
    return y
