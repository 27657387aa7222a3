"""Golden tests for the fused Pallas 3x3 conv (ops/conv3x3.py).

Runs the kernel in interpret mode on CPU (HRVITON_PALLAS_INTERPRET=1 is set
before importing the op) and checks exact agreement with the XLA reference:
forward, fused pre-activations, bias, batch/edge handling, custom VJP, and
end-to-end equivalence of a SPADEResBlock with the fast path on vs off.
"""

import os

os.environ["HRVITON_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# the ops package re-exports the conv3x3 *function*, which shadows the
# submodule attribute — resolve the module explicitly
c3 = importlib.import_module("hrviton_tpu.ops.conv3x3")
conv3x3, fast_conv = c3.conv3x3, c3.fast_conv

_rng = np.random.default_rng(0)


def _arr(shape, scale=1.0):
    return jnp.asarray(_rng.standard_normal(shape) * scale, jnp.float32)


def _ref(x, w, bias=None, pre_act=None):
    return c3._conv3x3_ref(x, w, bias, pre_act)


@pytest.mark.parametrize("shape", [(2, 16, 24, 8), (1, 32, 16, 5)])
@pytest.mark.parametrize("pre_act", [None, "relu", "leaky0.2"])
def test_conv3x3_matches_xla(shape, pre_act):
    x = _arr(shape)
    w = _arr((3, 3, shape[-1], 12), 0.2)
    b = _arr((12,))
    with fast_conv(True):
        got = conv3x3(x, w, b, pre_act=pre_act)
    want = _ref(x, w, b, pre_act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv3x3_no_bias():
    x = _arr((2, 16, 16, 4))
    w = _arr((3, 3, 4, 6), 0.2)
    with fast_conv(True):
        got = conv3x3(x, w, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=1e-5, rtol=1e-5)


def test_conv3x3_edge_rows_zero_padded():
    # a constant input exposes wrong halo handling at the H borders
    x = jnp.ones((1, 24, 16, 3))
    w = _arr((3, 3, 3, 4), 0.3)
    with fast_conv(True):
        got = conv3x3(x, w, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=1e-5, rtol=1e-5)


def test_conv3x3_disabled_falls_back():
    x = _arr((1, 16, 16, 4))
    w = _arr((3, 3, 4, 4), 0.2)
    got = conv3x3(x, w, None)     # fast path off by default
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=0, rtol=0)


def test_conv3x3_vjp_matches_xla():
    x = _arr((1, 16, 16, 4))
    w = _arr((3, 3, 4, 6), 0.2)
    b = _arr((6,))

    def f_fast(x, w, b):
        with fast_conv(True):
            return jnp.sum(jnp.sin(conv3x3(x, w, b, pre_act="leaky0.2")))

    def f_ref(x, w, b):
        return jnp.sum(jnp.sin(_ref(x, w, b, pre_act="leaky0.2")))

    g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for gf, gr in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-5, rtol=1e-4)


def test_spade_block_fast_conv_equivalence():
    from hrviton_tpu.models.spade import SPADEResBlock

    blk = SPADEResBlock(8, 6, norm_g="spectralaliasinstance",
                        gen_semantic_nc=7)
    x = _arr((2, 16, 16, 8))
    seg = _arr((2, 16, 16, 7))
    v = blk.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, x, seg, train=False)

    def run():
        return blk.apply(v, x, seg, train=False,
                         rngs={"noise": jax.random.PRNGKey(2)})

    base = run()
    with fast_conv(True):
        fastr = run()
    np.testing.assert_allclose(np.asarray(fastr), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_conv2d_module_param_layout_unchanged():
    """_ConvCore must keep nn.Conv's 'conv/kernel'+'conv/bias' layout so
    existing checkpoints and converters keep loading."""
    from hrviton_tpu.nn.layers import Conv2d

    m = Conv2d(6, 3, padding=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    assert set(v["params"]) == {"conv"}
    assert set(v["params"]["conv"]) == {"kernel", "bias"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 4, 6)
    assert v["params"]["conv"]["kernel"].dtype == jnp.float32


def test_conv2d_strided_path_unchanged():
    from hrviton_tpu.nn.layers import Conv2d

    m = Conv2d(6, 3, stride=2, padding=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    x = _arr((2, 8, 8, 4))
    y = m.apply(v, x)
    assert y.shape == (2, 4, 4, 6)
