"""Golden tests for the small-cout 3-view conv kernel (ops/conv3x3.py
_conv3x3_views_pallas) — the conv_img (32->3 full-res) fast path."""

import os

os.environ["HRVITON_PALLAS_INTERPRET"] = "1"

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

c3 = importlib.import_module("hrviton_tpu.ops.conv3x3")

_rng = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _small_tiles(monkeypatch):
    monkeypatch.setattr(c3, "_INTERPRET", True)
    monkeypatch.setattr(c3, "_VTH", 4)
    monkeypatch.setattr(c3, "_VIEWS", True)


def _arr(shape, scale=1.0):
    return jnp.asarray(_rng.standard_normal(shape) * scale, jnp.float32)


@pytest.mark.parametrize("pre_act", [None, "leaky0.2"])
@pytest.mark.parametrize("h", [8, 12, 16])
def test_views_conv_matches_ref(h, pre_act):
    x = _arr((2, h, 128, 32))
    w = _arr((3, 3, 32, 3), 0.05)
    b = _arr((3,), 0.1)
    got = c3._conv3x3_views_pallas(x, w, b, pre_act)
    want = c3._conv3x3_ref(x, w, b, pre_act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4, err_msg=f"h={h}")


def test_views_dispatch_and_grads():
    """conv3x3() dispatches the views kernel at eligible shapes; its custom
    VJP equals autodiff of the reference conv."""
    x = _arr((1, 16, 128, 16))
    w = _arr((3, 3, 16, 3), 0.05)
    b = _arr((3,), 0.1)
    assert c3._views_eligible(x.shape, w.shape, (1, 1), (1, 1), x.dtype)
    got = c3.conv3x3(x, w, b, pre_act="leaky0.2")
    want = c3._conv3x3_ref(x, w, b, "leaky0.2")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    def loss(fn):
        return lambda x_, w_, b_: jnp.sum(fn(x_, w_, b_) ** 2)

    g1 = jax.grad(loss(lambda *a: c3.conv3x3(*a, pre_act="leaky0.2")),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss(lambda *a: c3._conv3x3_ref(*a, "leaky0.2")),
                  argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-3, rtol=1e-3)
