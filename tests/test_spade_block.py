"""Golden tests for the fused {SPADE-norm -> act -> conv} unit kernel
(ops/spade_block.py), run in Pallas interpret mode on CPU against the XLA
reference formulation: 3x3 and 1x1 consumers, pre-activations, residual
fusion, lane-padding invariants, and boundary rows (first/middle/last grid
steps)."""

import os

os.environ["HRVITON_PALLAS_INTERPRET"] = "1"

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sb = importlib.import_module("hrviton_tpu.ops.spade_block")

_rng = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _small_tiles(monkeypatch):
    monkeypatch.setattr(sb, "_INTERPRET", True)
    monkeypatch.setattr(sb, "_TH", 4)


def _arr(shape, scale=1.0, dtype=jnp.float32):
    return jnp.asarray(_rng.standard_normal(shape) * scale, dtype)


def _inputs(b=2, h=12, w=128, c=8, cout=16, nh=128, ksize=3):
    x = _arr((b, h, w, c))
    noise = _arr((b, h, w, 1))
    nscale = _arr((c,), 0.1)
    actv = _arr((b, h, w, nh))
    wg = _arr((3, 3, nh, c), 0.05)
    bg = _arr((c,), 0.1)
    wb = _arr((3, 3, nh, c), 0.05)
    bb = _arr((c,), 0.1)
    wc = _arr((ksize, ksize, c, cout), 0.05)
    bc = _arr((cout,), 0.1)
    return x, noise, nscale, actv, wg, bg, wb, bb, wc, bc


def _run_fused(x, noise, nscale, actv, wg, bg, wb, bb, wc, bc,
               pre_act=None, residual=None):
    c = x.shape[-1]
    cout = wc.shape[-1]
    xn = sb.pad_lanes(x + (noise * nscale).astype(x.dtype))
    mu, rsig = sb.spade_conv_stats(xn, c)
    res = sb.pad_lanes(residual) if residual is not None else None
    out = sb.fused_spade_conv(xn, mu, rsig, actv, wg, bg, wb, bb, wc, bc,
                              c=c, pre_act=pre_act, residual=res)
    return out, cout


@pytest.mark.parametrize("pipelined", [True, False])
@pytest.mark.parametrize("ksize,pre_act", [(3, "leaky0.2"), (3, None),
                                           (1, None), (1, "relu")])
def test_fused_matches_reference(ksize, pre_act, pipelined, monkeypatch):
    monkeypatch.setattr(sb, "_PIPELINED", pipelined)
    args = _inputs(ksize=ksize)
    out, cout = _run_fused(*args, pre_act=pre_act)
    want = sb.spade_conv_ref(*args, pre_act=pre_act)
    np.testing.assert_allclose(np.asarray(sb.unpad_lanes(out, cout)),
                               np.asarray(want), atol=1e-4, rtol=1e-4)
    # lane-padding invariant: pad lanes stay exactly zero
    assert float(jnp.abs(out[..., cout:]).max()) == 0.0


def test_fused_residual():
    args = _inputs()
    residual = _arr((2, 12, 128, 16))
    out, cout = _run_fused(*args, pre_act="leaky0.2", residual=residual)
    want = sb.spade_conv_ref(*args, pre_act="leaky0.2", residual=residual)
    np.testing.assert_allclose(np.asarray(sb.unpad_lanes(out, cout)),
                               np.asarray(want), atol=1e-4, rtol=1e-4)


def test_fused_no_bias():
    args = list(_inputs(ksize=1))
    args[-1] = None   # bc
    out, _ = _run_fused(*args)
    want = sb.spade_conv_ref(*args)
    np.testing.assert_allclose(np.asarray(sb.unpad_lanes(out, 16)),
                               np.asarray(want), atol=1e-4, rtol=1e-4)


def test_fused_boundary_rows_exact():
    """h = 2*TH exercises the (first, last) grid-step pair with no middle;
    h = 4*TH covers first/middle/last. Boundary rows carry the conv's
    zero-padding semantics, the hardest part of the band bookkeeping."""
    for h in (8, 16):
        args = _inputs(h=h)
        out, cout = _run_fused(*args, pre_act="leaky0.2")
        want = sb.spade_conv_ref(*args, pre_act="leaky0.2")
        np.testing.assert_allclose(np.asarray(sb.unpad_lanes(out, cout)),
                                   np.asarray(want), atol=1e-4, rtol=1e-4,
                                   err_msg=f"h={h}")


def test_block_fused_equals_plain():
    """SPADEResBlock(fused=True) == plain path on the SAME param tree and
    the SAME 'noise' RNG stream (interpret mode), including gradients
    (the fused unit's custom VJP differentiates the reference formulation)."""
    import jax.tree_util as jtu

    from hrviton_tpu.models.spade import SPADEResBlock

    b, h, w = 2, 16, 128
    in_nc, out_nc = 8, 4
    x = _arr((b, h, w, in_nc))
    seg = _arr((b, h, w, 7))
    k = jax.random.PRNGKey(3)
    plain = SPADEResBlock(in_nc, out_nc)
    fused = SPADEResBlock(in_nc, out_nc, fused=True)
    v = plain.init({"params": k, "noise": k}, x, seg, train=False)
    v2 = fused.init({"params": k, "noise": k}, x, seg, train=False)
    assert jtu.tree_structure(v) == jtu.tree_structure(v2)

    def run(mdl, vv):
        return mdl.apply(vv, x, seg, train=False, rngs={"noise": k})

    np.testing.assert_allclose(np.asarray(run(fused, v)),
                               np.asarray(run(plain, v)),
                               atol=2e-4, rtol=2e-4)

    def loss(mdl):
        def f(params):
            out = mdl.apply({**v, "params": params}, x, seg, train=False,
                            rngs={"noise": k})
            return jnp.sum(out * out)
        return f

    g1 = jax.grad(loss(plain))(v["params"])
    g2 = jax.grad(loss(fused))(v["params"])
    for p1, p2 in zip(jtu.tree_leaves(g1), jtu.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=5e-3, rtol=5e-3)


def test_wide_channels_pad_bucket():
    """c=80-style: true channels well below the 128 pad (up_4's shape class,
    scaled down)."""
    args = _inputs(c=40, cout=24)
    out, cout = _run_fused(*args, pre_act="leaky0.2")
    want = sb.spade_conv_ref(*args, pre_act="leaky0.2")
    np.testing.assert_allclose(np.asarray(sb.unpad_lanes(out, cout)),
                               np.asarray(want), atol=1e-4, rtol=1e-4)
