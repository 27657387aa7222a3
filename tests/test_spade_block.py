"""Golden tests for the fused {SPADE-norm -> act -> conv} unit kernel
(ops/spade_block.py), run in Pallas interpret mode on CPU against the XLA
reference formulation: 3x3 and 1x1 consumers (both software-pipelined),
pre-activations, residual fusion, custom-VJP gradients, and boundary rows
(first/middle/last grid steps of the producer/consumer pipeline)."""

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


@pytest.mark.parametrize("ksize,pre_act", [(3, "leaky0.2"), (3, None),
                                           (1, None), (1, "relu")])
def test_fused_matches_reference(ksize, pre_act):
    args = _inputs(ksize=ksize)
    out = sb.spade_conv_unit(pre_act, *args)
    want = sb.spade_conv_ref(*args, pre_act=pre_act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_residual():
    args = _inputs()
    residual = _arr((2, 12, 128, 16))
    out = sb.spade_conv_unit("leaky0.2", *args, residual)
    want = sb.spade_conv_ref(*args, pre_act="leaky0.2", residual=residual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_no_bias():
    args = list(_inputs(ksize=1))
    args[-1] = None   # bc
    out = sb.spade_conv_unit(None, *args)
    want = sb.spade_conv_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ksize", [3, 1])
def test_fused_boundary_rows_exact(ksize):
    """h = 2*TH exercises the shortest pipeline (producers 0..1, consumers
    lag..); h = 4*TH covers first/middle/last. Boundary rows carry the
    conv's zero-padding semantics via the ring edge-zeroing steps."""
    for h in (8, 16):
        args = _inputs(h=h, ksize=ksize)
        out = sb.spade_conv_unit("leaky0.2", *args)
        want = sb.spade_conv_ref(*args, pre_act="leaky0.2")
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"h={h} ksize={ksize}")


def test_wide_channels():
    """c=40/cout=24: channel counts away from the lane size (up_4's shape
    class scaled down; v3 has no lane-padding constraint on C)."""
    args = _inputs(c=40, cout=24)
    out = sb.spade_conv_unit("leaky0.2", *args)
    want = sb.spade_conv_ref(*args, pre_act="leaky0.2")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_bias,with_res", [(True, True), (True, False),
                                                (False, True)])
def test_unit_gradients(with_bias, with_res):
    """custom-VJP gradients == autodiff of the reference formulation, for
    every (bc, residual) presence combination the block uses."""
    args = list(_inputs())
    if not with_bias:
        args[-1] = None
    residual = _arr((2, 12, 128, 16)) if with_res else None

    def loss_fused(x, nscale, wg, wc):
        a = [x, args[1], nscale, args[3], wg, *args[5:8], wc, args[9]]
        out = sb.spade_conv_unit("leaky0.2", *a, residual)
        return jnp.sum(out * out)

    def loss_ref(x, nscale, wg, wc):
        a = [x, args[1], nscale, args[3], wg, *args[5:8], wc, args[9]]
        out = sb.spade_conv_ref(*a, pre_act="leaky0.2", residual=residual)
        return jnp.sum(out * out)

    diff_args = (args[0], args[2], args[4], args[8])
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*diff_args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*diff_args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)


def test_block_fused_equals_plain():
    """SPADEResBlock(fused=True) == plain path on the SAME param tree and
    the SAME 'noise' RNG stream (interpret mode), including gradients."""
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
