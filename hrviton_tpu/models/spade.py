"""SPADE (ALIAS) image generator — stage 2 of HR-VITON.

TPU-native re-design of ``SPADEGenerator`` and friends
(/root/reference/network_generator.py:52-245): NHWC, Flax, multi-scale input
heads, spectrally-normalized SPADE residual blocks conditioned on the 7-channel
parse map, per-norm learned noise injection.

Notes vs the reference:
  * 'normal' num_upsampling_layers is rejected: the reference crashes there
    (G_middle_1 concat size mismatch, network_generator.py:228-230); only
    'more'/'most' are reachable configurations.
  * Noise is injected in eval as well (parity: network_generator.py:104-107);
    thread a 'noise' PRNG via ``apply(..., rngs={'noise': key})``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hrviton_tpu.config import SPADEGenConfig
from hrviton_tpu.nn.layers import (Conv2d, InstanceNorm2d, SpectralNorm2d,
                                   BatchNorm2d, leaky_relu, xavier_normal_init)
from hrviton_tpu.ops.conv3x3 import conv3x3
from hrviton_tpu.ops.resize import interpolate
from hrviton_tpu.ops.s2d import (concat_s2d, from_s2d, instance_norm_s2d,
                                 to_s2d, upsample2x_s2d)
from hrviton_tpu.ops.spade_fused import (fused_spade_eligible,
                                         fused_spade_modulate)

_xavier = xavier_normal_init(0.02)

# Merged gamma+beta modulation conv: one 3x3 conv with the two kernels
# concatenated on the output axis, split after — exactly equivalent (each
# output channel sees the same taps) and 1.5x faster IN ISOLATION
# (conv3x3 128->160 = 19.4 ms vs 2 x (128->80) = 29.9 ms, tools/exp_conv_eff)
# because it reads the 128-channel `actv` from HBM once instead of twice.
# But measured SLOWER in the composed pipeline (16.1 vs 17.1 img/s, bench.py
# r3) — the split outputs lose the per-conv elementwise fusion XLA gives the
# separate convs, the same in-block-fusion lesson as ops/conv3x3 (ROADMAP §1).
# Kept as an off-by-default knob (SPADEGenConfig.merge_gamma_beta, or this
# experiment switch); param tree is identical either way.
import contextlib as _contextlib

_MERGE_GB = False

# TIMING-ONLY composed-knockout hooks (tools/exp_gen_knockout.py): each tag
# statically replaces one generator piece with a shape-preserving stub so the
# composed-pipeline diff attributes its in-context cost (the only honest
# attribution method — ROADMAP §4's measurement-hygiene rule). Never active
# in production; empty set compiles the exact production graph.
_GEN_KNOCK: frozenset = frozenset()


@_contextlib.contextmanager
def gen_knock(tags):
    """Timing-only: statically stub generator pieces. Tags: 'conv_shared',
    'seg_for', 'unit', 'stats', 'features', 'conv_img' (and the in-kernel
    tags of ops/spade_block.py, forwarded)."""
    global _GEN_KNOCK
    prev = _GEN_KNOCK
    _GEN_KNOCK = frozenset(tags)
    try:
        yield
    finally:
        _GEN_KNOCK = prev


def _tie(shape, dtype, *tensors):
    """A cheap const of `shape` data-tied to `tensors` (FULL-tensor scalar
    reductions) so a knocked piece's inputs aren't dead-code-eliminated out
    of the timing. The reduction must touch EVERY element: a first version
    summed only `t[..., :1]`, which let XLA DCE the producers of the other
    channels — knocking the feature pyramid then silently deleted the warp
    (gen_in channels 6:9) and inflated that attribution from ~(real) to
    69-77 ms. Full sums cost one read of each tied tensor (~0.1 ms/GB)."""
    s = sum(jnp.sum(t.astype(jnp.float32)) * 0 for t in tensors)
    return jnp.full(shape, 0.1, dtype) + s.astype(dtype)


def enable_merge_gamma_beta(on: bool = True) -> None:
    global _MERGE_GB
    _MERGE_GB = on


@_contextlib.contextmanager
def merge_gamma_beta(on: bool = True):
    global _MERGE_GB
    prev = _MERGE_GB
    _MERGE_GB = bool(on)
    try:
        yield
    finally:
        _MERGE_GB = prev


class _KernelBias(nn.Module):
    """Declares Conv2d-compatible 'kernel'/'bias' params without the conv."""

    features: int
    ksize: int
    kernel_init: nn.initializers.Initializer

    @nn.compact
    def __call__(self, cin):
        k = self.param("kernel", self.kernel_init,
                       (self.ksize, self.ksize, cin, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _RawConv(nn.Module):
    """Param-tree-compatible stand-in for Conv2d (same '<name>/conv/kernel'
    and '<name>/conv/bias' paths) that returns the raw weights for use by the
    fused SPADE kernel instead of applying the convolution."""

    features: int
    ksize: int
    kernel_init: nn.initializers.Initializer

    @nn.compact
    def __call__(self, cin):
        return _KernelBias(self.features, self.ksize, self.kernel_init,
                           name="conv")(cin)


class MaskNorm(nn.Module):
    """MaskNorm (/root/reference/network_generator.py:52-72): separate
    instance-normalization of fore/background regions with pixel-count rescale."""

    @nn.compact
    def __call__(self, x, mask):
        mask = jax.lax.stop_gradient(mask)

        def region(r, m):
            b, h, w, c = r.shape
            num = jnp.sum(m, axis=(1, 2), keepdims=True)
            num = jnp.where(num == 0, 1.0, num)
            mu = jnp.sum(r, axis=(1, 2), keepdims=True) / num
            normalized = InstanceNorm2d()(r + (1.0 - m) * mu)
            return normalized * jnp.sqrt(num / (h * w))

        fg = region(x * mask, mask)
        bg = region(x * (1.0 - mask), 1.0 - mask)
        return fg + bg


class SPADENorm(nn.Module):
    """SPADENorm 'alias*' (/root/reference/network_generator.py:75-122)."""

    norm_nc: int
    label_nc: int
    norm_type: str = "aliasinstance"   # aliasinstance | aliasbatch | aliasmask
    nhidden: int = 128

    @nn.compact
    def __call__(self, x, seg, misalign_mask=None, train: bool = True,
                 s2d: bool = False, raw: bool = False):
        b, h, w, _ = x.shape
        noise_scale = self.param("noise_scale", nn.initializers.zeros,
                                 (self.norm_nc,), jnp.float32)
        kind = self.norm_type[len("alias"):]
        if raw:
            # Piece-extraction mode for the fused block unit
            # (ops/spade_block.py): returns (noise field, noise_scale,
            # pre-relu actv, gamma/beta weights) so the caller can fuse
            # {noise-add, normalize, modulate, consumer conv} into one
            # kernel. Identical params and 'noise' RNG stream (same module
            # path); x supplies only shape/dtype.
            if kind != "instance":
                raise NotImplementedError("raw SPADENorm: instance only")
            noise1 = jax.random.normal(self.make_rng("noise"), (b, h, w, 1),
                                       dtype=jnp.float32)
            if "conv_shared" in _GEN_KNOCK:   # timing-only (gen_knock)
                Conv2d(self.nhidden, 3, padding=1, kernel_init=_xavier,
                       name="conv_shared")(seg[:1, :1, :1].astype(x.dtype))
                actv = _tie((b, h, w, self.nhidden), x.dtype, seg)
            else:
                actv = Conv2d(self.nhidden, 3, padding=1, kernel_init=_xavier,
                              name="conv_shared")(seg.astype(x.dtype))
            wg, bg = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                            name="conv_gamma")(actv, raw=True)
            wb, bb = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                            name="conv_beta")(actv, raw=True)
            return noise1, noise_scale, actv, wg, bg, wb, bb
        if s2d:
            # x/seg are space-to-depth tensors (ops/s2d.py); identical math
            # and parameter tree, 128-lane-aligned channel counts. The noise
            # field is drawn at the plain full-res shape so the values (and
            # the rng stream) match the plain path exactly.
            if kind != "instance":
                raise NotImplementedError("s2d SPADENorm: instance only")
            noise2 = to_s2d(jax.random.normal(
                self.make_rng("noise"), (b, 2 * h, 2 * w, 1), jnp.float32))
            xn = x + (jnp.repeat(noise2, self.norm_nc, axis=-1)
                      * jnp.tile(noise_scale, 4)).astype(x.dtype)
            normalized = instance_norm_s2d(xn, self.norm_nc)
            actv = Conv2d(self.nhidden, 3, padding=1, kernel_init=_xavier,
                          name="conv_shared")(seg, s2d=True)
            gamma = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                           name="conv_gamma")(actv, pre_act="relu", s2d=True)
            beta = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                          name="conv_beta")(actv, pre_act="relu", s2d=True)
            return normalized * (1.0 + gamma) + beta

        noise1 = jax.random.normal(self.make_rng("noise"), (b, h, w, 1),
                                   dtype=jnp.float32)
        if (kind == "instance"
                and fused_spade_eligible(x.shape, self.nhidden, x.dtype)):
            # Fused Pallas path (ops/spade_fused.py): identical math and an
            # identical parameter tree — _RawConv mirrors Conv2d's param
            # paths so checkpoints/converters are oblivious to the dispatch.
            ws, bs = _RawConv(self.nhidden, 3, _xavier,
                              name="conv_shared")(seg.shape[-1])
            wg, bg = _RawConv(self.norm_nc, 3, _xavier,
                              name="conv_gamma")(self.nhidden)
            wb, bb = _RawConv(self.norm_nc, 3, _xavier,
                              name="conv_beta")(self.nhidden)
            actv = conv3x3(seg.astype(x.dtype), ws, bs)   # pre-relu
            return fused_spade_modulate(x, noise1, noise_scale, actv,
                                        wg, bg, wb, bb)

        noise = noise1 * noise_scale
        xn = x + noise.astype(x.dtype)
        if kind == "instance":
            normalized = InstanceNorm2d(name="param_free_norm")(xn)
        elif kind == "batch":
            normalized = BatchNorm2d(self.norm_nc, affine=False,
                                     name="param_free_norm")(
                xn, use_running_average=not train)
        elif kind == "mask":
            normalized = MaskNorm(name="param_free_norm")(xn, misalign_mask)
        else:
            raise ValueError(self.norm_type)

        actv = Conv2d(self.nhidden, 3, padding=1, kernel_init=_xavier,
                      name="conv_shared")(seg)
        # The relu on actv is fused into each consumer conv (pre_act) so the
        # Pallas conv path doesn't force XLA to materialize an extra copy.
        if _MERGE_GB:
            # one 2*norm_nc conv, kernels concatenated at trace time, outputs
            # split — exact and param-tree-identical (see module note; slower
            # composed, kept as a measured-dead-end knob).
            wg, bg = _RawConv(self.norm_nc, 3, _xavier,
                              name="conv_gamma")(self.nhidden)
            wb, bb = _RawConv(self.norm_nc, 3, _xavier,
                              name="conv_beta")(self.nhidden)
            gb = conv3x3(actv, jnp.concatenate([wg, wb], axis=-1),
                         jnp.concatenate([bg, bb]), pre_act="relu")
            gamma = gb[..., :self.norm_nc]
            beta = gb[..., self.norm_nc:]
        else:
            gamma = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                           name="conv_gamma")(actv, pre_act="relu")
            beta = Conv2d(self.norm_nc, 3, padding=1, kernel_init=_xavier,
                          name="conv_beta")(actv, pre_act="relu")
        return normalized * (1.0 + gamma) + beta


class SPADEResBlock(nn.Module):
    """SPADEResBlock (/root/reference/network_generator.py:125-173)."""

    input_nc: int
    output_nc: int
    norm_g: str = "spectralaliasinstance"
    gen_semantic_nc: int = 7
    use_mask_norm: bool = False
    fused: bool = False   # fuse each {SPADENorm -> act -> conv} pair into
                          # one Pallas pass when eligible (ops/spade_block.py)

    @nn.compact
    def __call__(self, x, seg, misalign_mask=None, train: bool = True,
                 update_sn: bool = False, s2d: bool = False):
        learned_shortcut = self.input_nc != self.output_nc
        middle_nc = min(self.input_nc, self.output_nc)

        subnorm = self.norm_g
        spectral = subnorm.startswith("spectral")
        if spectral:
            subnorm = subnorm[len("spectral"):]
        label_nc = self.gen_semantic_nc
        if self.use_mask_norm:
            subnorm = "aliasmask"
            label_nc = label_nc + 1

        if s2d:
            # x and seg arrive as space-to-depth tensors on the same grid
            # (the caller pre-resizes seg; mask norm is not s2d-supported)
            assert misalign_mask is None
        else:
            seg = interpolate(seg, size=x.shape[1:3], mode="nearest")
            if misalign_mask is not None:
                misalign_mask = interpolate(misalign_mask, size=x.shape[1:3],
                                            mode="nearest")

        def conv(feats, ksize, pad, use_bias, name):
            if spectral:
                return SpectralNorm2d(feats, ksize, padding=pad, use_bias=use_bias,
                                      kernel_init=_xavier, name=name)
            return Conv2d(feats, ksize, padding=pad, use_bias=use_bias,
                          kernel_init=_xavier, name=name)

        def norm(nc, name):
            return SPADENorm(nc, label_nc, norm_type=subnorm, name=name)

        def apply_conv(mod, h, pre_act=None):
            if spectral:
                return mod(h, update_stats=update_sn, pre_act=pre_act,
                           s2d=s2d)
            return mod(h, pre_act=pre_act, s2d=s2d)

        from hrviton_tpu.ops.spade_block import (fused_spade_conv_eligible,
                                                 spade_conv_unit)
        if (self.fused and not s2d and subnorm == "aliasinstance"
                and misalign_mask is None
                and fused_spade_conv_eligible(x.shape[1], x.shape[2],
                                              128, x.dtype)):
            # Fused block: each {SPADENorm, conv} pair runs as one
            # software-pipelined Pallas pass (ops/spade_block.py), erasing
            # the modulate->conv boundary whose lost XLA fusion made the
            # per-norm kernel a composed regression (tools/exp_fs_sites.py:
            # the entire 17.0->15.5 img/s loss sat at up_4's three norm
            # sites). Identical params, RNG streams, and numerics; module
            # creation order matches the unfused path so the param tree is
            # byte-identical.
            def raw_conv(feats, ksize, pad, use_bias, name, in_nc):
                mod = conv(feats, ksize, pad, use_bias, name)
                probe = jnp.zeros((1, 1, 1, in_nc), x.dtype)
                if spectral:
                    return mod(probe, update_stats=update_sn, raw=True)
                return mod(probe, raw=True)

            def unit(tag_norm, tag_conv, ksize, use_bias, xin, c_in, c_out,
                     pre_act, residual=None):
                noise1, nsc, actv, wg, bg, wb, bb = norm(c_in, tag_norm)(
                    xin, seg, None, train, raw=True)
                wc, bc = raw_conv(c_out, ksize, 1 if ksize == 3 else 0,
                                  use_bias, tag_conv, c_in)
                if _GEN_KNOCK:   # timing-only stubs (gen_knock)
                    if "unit" in _GEN_KNOCK:
                        out = (xin[..., :c_out] if c_in >= c_out else
                               jnp.concatenate(
                                   [xin, xin[..., :c_out - c_in]], -1))
                        # tie xin FULLY: the channel slice alone would DCE
                        # upstream producers of channels >= c_out
                        out = out + _tie((), xin.dtype, xin, actv, wc[0, 0])
                        return out + residual if residual is not None else out
                    from hrviton_tpu.ops.spade_block import fused_spade_conv
                    return fused_spade_conv(
                        xin, noise1, nsc, actv, wg, bg, wb, bb, wc, bc,
                        pre_act=pre_act, residual=residual,
                        _knock=tuple(_GEN_KNOCK))
                return spade_conv_unit(pre_act, xin, noise1, nsc, actv,
                                       wg, bg, wb, bb, wc, bc, residual)

            xs = (unit("norm_s", "conv_s", 1, False, x, self.input_nc,
                       self.output_nc, None)
                  if learned_shortcut else x)
            dx = unit("norm_0", "conv_0", 3, True, x, self.input_nc,
                      middle_nc, "leaky0.2")
            return unit("norm_1", "conv_1", 3, True, dx, middle_nc,
                        self.output_nc, "leaky0.2", residual=xs)

        if learned_shortcut:
            xs = norm(self.input_nc, "norm_s")(x, seg, misalign_mask, train,
                                               s2d=s2d)
            xs = apply_conv(conv(self.output_nc, 1, 0, False, "conv_s"), xs)
        else:
            xs = x

        dx = norm(self.input_nc, "norm_0")(x, seg, misalign_mask, train,
                                           s2d=s2d)
        dx = apply_conv(conv(middle_nc, 3, 1, True, "conv_0"), dx,
                        pre_act="leaky0.2")
        dx = norm(middle_nc, "norm_1")(dx, seg, misalign_mask, train, s2d=s2d)
        dx = apply_conv(conv(self.output_nc, 3, 1, True, "conv_1"), dx,
                        pre_act="leaky0.2")
        return xs + dx


class SPADEGenerator(nn.Module):
    cfg: SPADEGenConfig = SPADEGenConfig()

    @nn.compact
    def __call__(self, x, seg, train: bool = True, update_sn: bool = False):
        """x: (N, fine_h, fine_w, input_nc); seg: (N, fine_h, fine_w, 7)
        float one-hot, or (N, fine_h, fine_w) int LABELS in [0, 7).

        The label form is the composed-pipeline fast path: every SPADE block
        consumes seg nearest-downsampled to its scale, and for an in-graph-
        produced full-res one-hot XLA loses the slice fusions it has when seg
        is a jit argument (+50 GB logical traffic measured at 1024x768 b4,
        tools/exp_hlo_diff.py). Slicing the compact int map per scale and
        one-hotting locally is bit-identical (slice of a one-hot == one-hot of
        the slice; nearest integer-ratio downsample == stride slice,
        ops/resize.py:64-90) but keeps each consumer chain tiny and fusible.
        """
        # Config-owned trace-time dispatch knobs (the ops-level context
        # managers stay available for A/B experiments; config is the source
        # of truth for real runs). Trace-time is the right scope: remat
        # replays jaxprs, never re-traces, so the choice sticks.
        with _contextlib.ExitStack() as stack:
            if self.cfg.fast_conv:
                from hrviton_tpu.ops.conv3x3 import fast_conv
                stack.enter_context(fast_conv(True))
            if self.cfg.fast_spade:
                from hrviton_tpu.ops.spade_fused import fast_spade
                stack.enter_context(fast_spade(True))
            if self.cfg.merge_gamma_beta:
                stack.enter_context(merge_gamma_beta(True))
            return self._forward(x, seg, train, update_sn)

    def _forward(self, x, seg, train: bool, update_sn: bool):
        cfg = self.cfg
        if cfg.num_upsampling_layers not in ("more", "most"):
            raise ValueError(
                "num_upsampling_layers must be 'more' or 'most' — 'normal' is "
                "unreachable in the reference (channel mismatch at "
                "network_generator.py:230)")
        nf = cfg.ngf
        sh, sw = cfg.latent_hw

        labels = seg if seg.ndim == 3 else None

        def seg_for(ref):
            """seg at ref's spatial scale: one-hot of the strided label
            slice (labels form), or a nearest resize of the one-hot form.

            Always scale-correct: the plain blocks' internal resize
            (SPADEResBlock, models/spade.py:226) then no-ops, and the s2d
            callers below — which require caller-resized seg — get the
            right grid (regression test: tests/test_s2d.py:84)."""
            th, tw = ref.shape[1], ref.shape[2]
            if "seg_for" in _GEN_KNOCK:   # timing-only (gen_knock)
                return _tie((x.shape[0], th, tw, cfg.gen_semantic_nc),
                            x.dtype, seg if labels is None else labels)
            if labels is None:
                if seg.shape[1:3] == (th, tw):
                    return seg
                return interpolate(seg, size=(th, tw), mode="nearest")
            lh, lw = labels.shape[1], labels.shape[2]
            if lh % th or lw % tw:   # non-integer ratio: fall back via take
                lab = interpolate(labels[..., None].astype(jnp.float32),
                                  size=(th, tw), mode="nearest")[..., 0]
                lab = lab.astype(jnp.int32)
            else:
                lab = labels[:, ::lh // th, ::lw // tw].astype(jnp.int32)
            return (lab[..., None] ==
                    jnp.arange(cfg.gen_semantic_nc, dtype=jnp.int32)
                    ).astype(x.dtype)
        # s2d tail (ops/s2d.py): run the two full-res blocks + conv_img in
        # the space-to-depth domain where their 7/16/32/80-channel tensors
        # become 128-lane-aligned; exact math, identical parameter tree.
        use_s2d = cfg.s2d_tail and cfg.num_upsampling_layers == "most"

        n_feats = 6 if use_s2d else 8
        if "features" in _GEN_KNOCK:   # timing-only (gen_knock)
            for i in range(n_feats):
                Conv2d(nf * 16 if i == 0 else 16, 3, padding=1,
                       kernel_init=_xavier, name=f"conv_{i}")(x[:, :1, :1])
            features = [
                _tie((x.shape[0], sh * 2 ** i, sw * 2 ** i,
                      nf * 16 if i == 0 else 16), x.dtype, x)
                for i in range(n_feats)]
        else:
            if "pyramid" in _GEN_KNOCK:   # timing-only: const samples,
                # real convs — splits the features attribution between the
                # 8-scale nearest-resize chain and the convs themselves
                samples = [_tie((x.shape[0], sh * 2 ** i, sw * 2 ** i,
                                 x.shape[-1]), x.dtype, x)
                           for i in range(n_feats)]
            else:
                # (A progressive-halving pyramid — each level a ::2 slice
                # of the previous, bit-exact — measured composed-NEUTRAL
                # at 21.1 vs 21.8 img/s r5 and was reverted; the apparent
                # 69 ms pyramid cost was a knockout-tie artifact, see
                # _tie's docstring and ROADMAP §1.)
                samples = [interpolate(x, size=(sh * 2 ** i, sw * 2 ** i),
                                       mode="nearest")
                           for i in range(n_feats)]
            features = [
                Conv2d(nf * 16 if i == 0 else 16, 3, padding=1,
                       kernel_init=_xavier, name=f"conv_{i}")(samples[i])
                for i in range(n_feats)
            ]

        # remat: recompute each SPADE block in the backward pass instead of
        # storing its activations — full-res 1024x768 training does not fit a
        # single 16G chip otherwise (38G of HLO temps measured). Forward-only
        # use is unaffected. Toggle via SPADEGenConfig.remat. The static flags
        # (train/update_sn) stay out of the remat signature via closure.
        if cfg.remat:
            @nn.remat
            def run_block(mdl, x_, seg_):
                return mdl(x_, seg_, None, train, update_sn)

            @nn.remat
            def run_block_s2d(mdl, x_, seg_):
                return mdl(x_, seg_, None, train, update_sn, s2d=True)
        else:
            def run_block(mdl, x_, seg_):
                return mdl(x_, seg_, None, train, update_sn)

            def run_block_s2d(mdl, x_, seg_):
                return mdl(x_, seg_, None, train, update_sn, s2d=True)

        def make_block(in_nc, out_nc, name):
            return SPADEResBlock(in_nc, out_nc, norm_g=cfg.norm_g,
                                 gen_semantic_nc=cfg.gen_semantic_nc,
                                 use_mask_norm=False,
                                 fused=cfg.fused_block, name=name)

        def block(in_nc, out_nc, name):
            mdl = make_block(in_nc, out_nc, name)
            return lambda x_, seg_, _m, _t, _u: run_block(mdl, x_, seg_)

        def up(h):
            return interpolate(h, scale_factor=2, mode="nearest")

        h = block(nf * 16, nf * 16, "head_0")(features[0], seg_for(features[0]),
                                              None, train, update_sn)
        h = up(h)
        h = block(nf * 16 + 16, nf * 16, "G_middle_0")(
            jnp.concatenate([h, features[1]], axis=-1), seg_for(features[1]),
            None, train, update_sn)
        if cfg.num_upsampling_layers in ("more", "most"):
            h = up(h)
        h = block(nf * 16 + 16, nf * 16, "G_middle_1")(
            jnp.concatenate([h, features[2]], axis=-1), seg_for(features[2]),
            None, train, update_sn)

        out_nf = nf
        h = up(h)
        h = block(nf * 16 + 16, nf * 8, "up_0")(
            jnp.concatenate([h, features[3]], axis=-1), seg_for(features[3]),
            None, train, update_sn)
        h = up(h)
        h = block(nf * 8 + 16, nf * 4, "up_1")(
            jnp.concatenate([h, features[4]], axis=-1), seg_for(features[4]),
            None, train, update_sn)
        h = up(h)
        h = block(nf * 4 + 16, nf * 2, "up_2")(
            jnp.concatenate([h, features[5]], axis=-1), seg_for(features[5]),
            None, train, update_sn)

        if use_s2d:
            # 'most' tail at 512x384 and 1024x768 in the s2d domain. The
            # nearest downscales of the 8-scale input pyramid are stride-2
            # slices == phase-0 channels, the nearest x2 upsample is a
            # channel tile, and the seg pyramid maps the same way.
            x6 = x[:, ::2, ::2, :]
            feat6 = Conv2d(16, 3, padding=1, kernel_init=_xavier,
                           name="conv_6")(to_s2d(x6), s2d=True)
            feat7 = Conv2d(16, 3, padding=1, kernel_init=_xavier,
                           name="conv_7")(to_s2d(x), s2d=True)
            seg6 = to_s2d(seg_for(x6))
            seg7 = to_s2d(seg_for(x))
            h = upsample2x_s2d(h)                         # up to 512x384
            h = concat_s2d([h, feat6], [nf * 2, 16])
            h = run_block_s2d(make_block(nf * 2 + 16, nf, "up_3"), h, seg6)
            h = upsample2x_s2d(from_s2d(h, nf))           # up to 1024x768
            h = concat_s2d([h, feat7], [nf, 16])
            h = run_block_s2d(make_block(nf + 16, nf // 2, "up_4"), h, seg7)
            h = Conv2d(3, 3, padding=1, kernel_init=_xavier,
                       name="conv_img")(h, pre_act="leaky0.2", s2d=True)
            return jnp.tanh(from_s2d(h, 3))

        h = up(h)
        h = block(nf * 2 + 16, nf, "up_3")(
            jnp.concatenate([h, features[6]], axis=-1), seg_for(features[6]),
            None, train, update_sn)
        if cfg.num_upsampling_layers == "most":
            h = up(h)
            h = block(nf + 16, nf // 2, "up_4")(
                jnp.concatenate([h, features[7]], axis=-1),
                seg_for(features[7]), None, train, update_sn)
            out_nf = nf // 2

        if "conv_img" in _GEN_KNOCK:   # timing-only (gen_knock)
            Conv2d(3, 3, padding=1, kernel_init=_xavier,
                   name="conv_img")(h[:, :1, :1], pre_act="leaky0.2")
            return jnp.tanh(h[..., :3])
        h = Conv2d(3, 3, padding=1, kernel_init=_xavier,
                   name="conv_img")(h, pre_act="leaky0.2")
        return jnp.tanh(h)
