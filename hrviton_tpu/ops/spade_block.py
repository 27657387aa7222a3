"""Pallas TPU kernel: fused {SPADE-norm -> activation -> consumer conv} unit.

ROADMAP §1's "mega-kernel" win condition for the full-res SPADE stack. The
per-norm fused kernel (ops/spade_fused.py) wins isolated but LOSES composed
(15.7 vs 17.2 img/s): its output feeds an XLA conv, and that boundary
forfeits the producer-into-conv fusion XLA builds for the unfused chain.
This kernel consumes the modulated output into the block's own conv inside
the same pass:

    mu, rsig   = instance stats of x + noise*nscale   # one fused XLA pass
    actv       = conv_shared(seg)                     # XLA (7->128, pre-relu)
    ------------------------------------------------------------- in-kernel:
    xn         = x + noise * nscale
    normalized = (xn - mu) * rsig
    mod        = normalized * (1 + conv_g(relu(actv))) + conv_b(relu(actv))
    out        = conv(act(mod), Wc) + bias [+ residual]

The kernel is SOFTWARE-PIPELINED: grid step i's PRODUCER stage (gamma|beta
as ky-merged MXU dots + the modulate epilogue, on TH-row ALIGNED bands)
fills slot i of a VMEM ring while the CONSUMER stage (the conv, kx-merged
into one dot) drains block j = i - lag, whose input bands were written on
earlier steps — the stages share no data within a step, so Mosaic's
scheduler interleaves one stage's MXU dots with the other's VPU
rolls/epilogues. The serialized v1 form measured ~2x its MXU floor (26.6 ms
vs 20.5 pipelined at up_4 norm_0, tools/exp_spade_block.py round 4); the
first padded-interface form also materialized x+noise and 128-lane-padded
outputs, ~1.5 GB/unit of HBM traffic the XLA block never pays — v3 feeds
x/noise/residual/out through ALIGNED BlockSpec bands (no lane-padding
constraint: only the manually-DMA'd actv halo needs 128-multiple lanes,
and NH is 128) and draws noise per band like ops/spade_fused.py (a
(B, H/TH, TH, W) view so the 1-channel field doesn't lane-pad 128x).

Numerics match the unfused reference: conv taps accumulate in f32 and round
once to the compute dtype (the MXU conv contract), stats/normalize math in
f32, elementwise chain in the compute dtype. `spade_conv_unit` carries a
custom VJP whose backward is XLA autodiff of the identical reference
formulation, so the op is fully differentiable.

Mosaic formulations that survived round-1 hazards (see
.claude/skills/verify/SKILL.md): ref slicing (never sublane value slices),
128-lane manual DMA, pltpu.roll on f32 products, max(x, 0.2x) for leaky
(bf16 vector compares are unsupported).

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
           "fused_spade_conv_eligible"]

_TH = 8
_MIN_H = 256     # experiments may raise to restrict dispatch to one scale
_INTERPRET = bool(int(os.environ.get("HRVITON_PALLAS_INTERPRET", "0")))
_EPS = 1e-5
_LANE = 128


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
    """Static shape gate."""
    if not (h % _TH == 0 and w % _LANE == 0 and h > _TH):
        return False
    if nh % _LANE:       # actv rides a manual halo DMA: lanes must be 128k
        return False
    if _INTERPRET:
        return True
    if jax.default_backend() == "cpu":
        return False
    return dtype == jnp.bfloat16 and h >= _MIN_H


def _pipe_lag(ksize: int) -> int:
    """The 3x3 consumer needs bands j-1..j+1 resident (lag 2, ring 4);
    the 1x1 consumer needs only band j (lag 1, ring 2)."""
    return 2 if ksize == 3 else 1


def _kernel(x_ref, noise_ref, actv_hbm, nsc_ref, mu_ref, rsig_ref,
            wgb_ref, bgb_ref, wc_ref, bc_ref, res_ref, o_ref,
            at, ring, sem, *, ksize, pre_act, has_res, knock=()):
    # `knock`: TIMING-ONLY attribution stubs (tools/exp_block_knockout.py).
    # Empty (the only production value) compiles the exact kernel below;
    # each tag statically removes one stage to localize where the ms go.
    # x_ref: (1, TH, W, C) aligned band i (BlockSpec, clamped past n_i);
    # noise_ref: (1, 1, TH, W) f32 band; nsc/mu/rsig: (1, 1, C) f32;
    # wgb: (1, 3_ky*NH, 3_kx*2C) kx-lane-merged gamma|beta; bgb: (1, 1, 2C);
    # wc: (1, 3C, 3*cout) kx-lane-merged (3x3) or (1, C, cout) (1x1);
    # bc: (1, cout); res/o: (1, TH, W, cout) blocks at the LAGGED index.
    # Scratch: at (2, TH+2, W, NH) double-buffered actv halo bands,
    # ring (lag+2 | 2, TH, W, C) modulated bands, sem (2,) DMA slots.
    lag = _pipe_lag(ksize)
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    n_i = pl.num_programs(1) - lag
    ns = ring.shape[0]
    dtype = o_ref.dtype
    c = ring.shape[-1]
    ngb = wgb_ref.shape[-1] // 3     # == 2C
    col = lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    nh = at.shape[-1]

    def fetch(slot, idx, start):
        # actv band [idx*th - 1, (idx+1)*th + 1), edge-clamped
        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                at.at[slot], sem.at[slot])
            ca.start() if start else ca.wait()

        @pl.when(idx == 0)
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(0, th + 1)],
                at.at[slot, pl.ds(1, th + 1)], sem.at[slot])
            ca.start() if start else ca.wait()

        @pl.when(jnp.logical_and(idx == n_i - 1, idx > 0))
        def _():
            ca = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                at.at[slot, pl.ds(0, th + 1)], sem.at[slot])
            ca.start() if start else ca.wait()

    @pl.when(i == 0)
    def _():
        if "actv_dma" not in knock:
            fetch(0, 0, True)
        if ksize == 3:
            # mod row -1 (the conv's zero padding) for the j=0 consumer's
            # ky=0 band: slot ns-1 is not produced until step ns-1 > lag
            ring[ns - 1, th - 1] = jnp.zeros((wv, c), dtype)

    @pl.when(jnp.logical_and(i + 1 < n_i, True))
    def _():
        if "actv_dma" not in knock:
            fetch((i + 1) % 2, i + 1, True)

    # ---------------------------------------------------------- producer --
    @pl.when(i < n_i)
    def _():
        slot = i % 2
        if "actv_dma" not in knock:
            fetch(slot, i, False)

        @pl.when(i == 0)
        def _():
            at[slot, 0] = jnp.zeros((wv, nh), at.dtype)

        @pl.when(i == n_i - 1)
        def _():
            at[slot, th + 1] = jnp.zeros((wv, nh), at.dtype)

        if "prod_dots" in knock:
            gbd = jnp.zeros((th, wv, ngb), dtype) + bgb_ref[0, 0].astype(dtype)
        else:
            # gamma|beta: ky lane-merged actv bands (mod row r needs actv band
            # rows r..r+2), ONE kx-lane-merged dot + f32 product rolls; N is
            # 3 kx groups of [gamma (C) | beta (C)] tight-packed lanes.
            # Knockout attribution (tools/exp_block_knockout.py) showed the
            # kernel MXU-bound on THIS dot: 3 separate N=2C dots pad each to
            # the 128-lane MXU tile (2C=160 -> 256, 1.6x pad waste at up_4);
            # merging kx into lanes pads once (480 -> 512, 1.07x), the same
            # trick the consumer dot below always used. Non-128 lane slices
            # are shuffles; SUBLANE value slicing is the hazardous case.
            rows3a = jnp.concatenate(
                [jax.nn.relu(at[pl.ds(slot, 1), ky:ky + th][0])
                 for ky in range(3)], axis=-1)                 # (TH, W, 3NH)
            p = lax.dot_general(rows3a, wgb_ref[0],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            gb = jnp.zeros((th, wv, ngb), jnp.float32)
            for kx in range(3):
                q = p[..., kx * ngb:(kx + 1) * ngb]
                gb = gb + (q if "prod_rolls" in knock
                           else _roll_cols(q, kx, wv, col))
            gbd = gb.astype(dtype) + bgb_ref[0, 0].astype(dtype)

        # noise-add + normalize + modulate (f32 stats math, dtype chain)
        xn = x_ref[0] + (noise_ref[0, 0][:, :, None]
                         * nsc_ref[0]).astype(dtype)
        if "normalize" in knock:
            normalized = xn
        else:
            normalized = ((xn.astype(jnp.float32) - mu_ref[0]) *
                          rsig_ref[0]).astype(dtype)
        if "modulate" in knock:
            ring[i % ns] = normalized + gbd[..., :c]
        else:
            ring[i % ns] = (normalized * (1.0 + gbd[..., :c])
                            + gbd[..., c:2 * c])

    if ksize == 3:
        # last consumer's ky=2 tail: mod row H (zero padding). Slot n_i%ns
        # holds dead band n_i-ns (all its consumers have run).
        @pl.when(i == n_i + lag - 1)
        def _():
            ring[n_i % ns, 0] = jnp.zeros((wv, c), dtype)

    # ---------------------------------------------------------- consumer --
    @pl.when(i >= lag)
    def _():
        j = i - lag
        jj = j % ns
        if "cons_dots" in knock and ksize == 3:
            cout = wc_ref.shape[-1] // 3
            band1 = ring[pl.ds(jj, 1)][0]
            acc = _act(band1, pre_act)[..., :cout].astype(jnp.float32)
        elif ksize == 3:
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
                axis=-1)                                   # (TH, W, 3C)
            cout = wc_ref.shape[-1] // 3
            p = lax.dot_general(rows3m, wc_ref[0],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = jnp.zeros((th, wv, cout), jnp.float32)
            for kx in range(3):
                acc = acc + (p[..., kx * cout:(kx + 1) * cout]
                             if "cons_rolls" in knock else
                             _roll_cols(p[..., kx * cout:(kx + 1) * cout],
                                        kx, wv, col))
        else:
            cout = wc_ref.shape[-1]
            rows = _act(ring[pl.ds(jj, 1)][0], pre_act)
            acc = lax.dot_general(rows, wc_ref[0],
                                  dimension_numbers=(((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = acc.astype(dtype) + bc_ref[0].astype(dtype)
        if has_res:
            out = out + res_ref[0]
        o_ref[0] = out


def _stats(x, noise, nscale, c):
    """Per-(batch, channel) instance stats of x + noise*nscale — one fused
    XLA pass over x (xn itself is never materialized; the kernel recomputes
    the noise-add per band)."""
    xnf = (x + (noise * nscale).astype(x.dtype)).astype(jnp.float32)
    mu = jnp.mean(xnf, axis=(1, 2))
    var = jnp.mean(jnp.square(xnf - mu[:, None, None, :]), axis=(1, 2))
    return mu, lax.rsqrt(var + _EPS)


def fused_spade_conv(x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
                     *, pre_act=None, residual=None, _knock=()):
    """Fused SPADE-norm + consumer conv unit (see module docstring).

    x: (B, H, W, C) compute dtype; noise: (B, H, W, 1) f32; nscale: (C,);
    actv: (B, H, W, NH) PRE-relu conv_shared output, NH % 128 == 0;
    wg/wb: (3, 3, NH, C) HWIO modulation kernels; bg/bb: (C,);
    wc: (3, 3, C, cout) or (1, 1, C, cout) consumer kernel; bc or None;
    pre_act: None | 'relu' | 'leaky0.2' between the norm and the conv;
    residual: optional (B, H, W, cout) added to the conv output.
    Returns (B, H, W, cout).
    """
    n, h, w, c = x.shape
    nh = actv.shape[-1]
    cout = wc.shape[-1]
    ksize = wc.shape[0]
    assert h % _TH == 0 and h > _TH and w % _LANE == 0 and nh % _LANE == 0

    if "stats" in _knock:   # timing-only (exp_gen_knockout): skip the fused
        # XLA stats pass; the kernel normalizes with consts instead
        mu = jnp.zeros((n, c), jnp.float32)
        rsig = jnp.ones((n, c), jnp.float32)
    else:
        mu, rsig = _stats(x, noise, nscale, c)

    # wgb: (1, 3_ky*NH, 3_kx*2C) — kx lane groups of TIGHT gamma|beta lanes
    # (one MXU dot instead of 3 lane-padded ones; see kernel comment)
    def halfw(w_):
        return w_.transpose(1, 0, 2, 3).reshape(3, 3 * nh, c)
    wg3, wb3 = halfw(wg), halfw(wb)
    wgb = jnp.concatenate(
        [jnp.concatenate([wg3[kx], wb3[kx]], axis=-1) for kx in range(3)],
        axis=-1).reshape(1, 3 * nh, 6 * c).astype(x.dtype)
    bgb = jnp.concatenate([bg.astype(jnp.float32), bb.astype(jnp.float32)])

    # consumer kernel: K = ky*C + cin rows matching the ring lane concat;
    # N = kx lane groups of cout (3x3) or plain cout (1x1)
    if ksize == 3:
        wck = jnp.concatenate(
            [wc[:, kx].reshape(3 * c, cout) for kx in range(3)],
            axis=-1).reshape(1, 3 * c, 3 * cout)
    else:
        wck = wc.reshape(1, c, cout)
    wck = wck.astype(x.dtype)
    bck = jnp.zeros((cout,), jnp.float32) if bc is None else bc
    bck = bck.astype(jnp.float32).reshape(1, cout)

    n_i = h // _TH
    lag = _pipe_lag(ksize)
    vec = lambda a: a.astype(jnp.float32).reshape(-1, 1, c)
    clamped = lambda b_, i: (b_, jnp.clip(i, 0, n_i - 1), 0, 0)
    lagged = lambda b_, i: (b_, jnp.clip(i - lag, 0, n_i - 1), 0, 0)
    has_res = residual is not None
    res = residual if has_res else jnp.zeros((1, 1, 1, 1), x.dtype)
    res_spec = (pl.BlockSpec((1, _TH, w, cout), lagged) if has_res
                else pl.BlockSpec((1, 1, 1, 1), lambda b_, i: (0, 0, 0, 0)))

    return pl.pallas_call(
        partial(_kernel, ksize=ksize, pre_act=pre_act, has_res=has_res,
                knock=tuple(_knock)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=(n, n_i + lag),
        in_specs=[
            pl.BlockSpec((1, _TH, w, c), clamped),              # x band
            pl.BlockSpec((1, 1, _TH, w),
                         lambda b_, i: (b_, jnp.clip(i, 0, n_i - 1), 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                  # actv
            pl.BlockSpec((1, 1, c), lambda b_, i: (0, 0, 0)),   # nscale
            pl.BlockSpec((1, 1, c), lambda b_, i: (b_, 0, 0)),  # mu
            pl.BlockSpec((1, 1, c), lambda b_, i: (b_, 0, 0)),  # rsig
            pl.BlockSpec((1, 3 * nh, 6 * c), lambda b_, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda b_, i: (0, 0, 0)),  # bgb
            pl.BlockSpec(wck.shape, lambda b_, i: (0,) * 3),    # wc
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0)),      # bc
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, _TH, w, cout), lagged,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _TH + 2, w, nh), x.dtype),           # at
            pltpu.VMEM((lag + 2 if ksize == 3 else 2,
                        _TH, w, c), x.dtype),                   # ring
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_INTERPRET,
    )(x, noise.reshape(n, n_i, _TH, w).astype(jnp.float32), actv,
      vec(nscale), vec(mu), vec(rsig), wgb,
      bgb.reshape(1, 1, 2 * c), wck, bck, res)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def spade_conv_unit(pre_act, x, noise, nscale, actv, wg, bg, wb, bb,
                    wc, bc, residual=None):
    """Differentiable fused unit: Pallas forward, XLA-autodiff backward of
    the identical reference formulation. Dispatch on eligibility BEFORE
    calling (fused_spade_conv_eligible); bc may be None (bias-free conv)."""
    return fused_spade_conv(x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
                            pre_act=pre_act, residual=residual)


def _unit_fwd(pre_act, x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
              residual):
    out = spade_conv_unit(pre_act, x, noise, nscale, actv, wg, bg, wb, bb,
                          wc, bc, residual)
    return out, (x, noise, nscale, actv, wg, bg, wb, bb, wc, bc, residual)


def _unit_bwd(pre_act, resids, g):
    (x, noise, nscale, actv, wg, bg, wb, bb, wc, bc, residual) = resids
    diff = [x, noise, nscale, actv, wg, bg, wb, bb, wc]
    if bc is None:
        if residual is None:
            f = lambda *a: spade_conv_ref(*a, None, pre_act=pre_act)
            return (*jax.vjp(f, *diff)[1](g), None, None)
        f = lambda *a: spade_conv_ref(*a[:9], None, pre_act=pre_act,
                                      residual=a[9])
        return (*_split_last(jax.vjp(f, *diff, residual)[1](g)), )
    if residual is None:
        f = lambda *a: spade_conv_ref(*a, pre_act=pre_act)
        return (*jax.vjp(f, *diff, bc)[1](g), None)
    f = lambda *a: spade_conv_ref(*a[:10], pre_act=pre_act, residual=a[10])
    return jax.vjp(f, *diff, bc, residual)[1](g)


def _split_last(grads):
    """(..., d_res) -> (..., None_for_bc, d_res)."""
    return (*grads[:-1], None, grads[-1])


spade_conv_unit.defvjp(_unit_fwd, _unit_bwd)


def spade_conv_ref(x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
                   pre_act=None, residual=None):
    """XLA formulation with identical numerics (backward pass, CPU,
    ineligible shapes)."""
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
