"""LPIPS package (all backbones / fake nets / scoring) and metric tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hrviton_tpu.losses import (LPIPSModel, dssim_distance, l2_distance,
                                score_2afc, score_jnd)
from hrviton_tpu.infer import inception_score, mse, ssim_gray


@pytest.mark.parametrize("net,lpips", [("alex", True), ("vgg16", True),
                                       ("squeeze", True), ("alex", False)])
def test_lpips_backbones(net, lpips):
    model = LPIPSModel(net=net, lpips=lpips)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    d_same = model.apply(variables, x, x)
    d_diff = model.apply(variables, x, y)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(jnp.abs(d_diff).sum()) > 0


def test_l2_and_dssim_distances():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(l2_distance(x, x)), 0.0, atol=1e-7)
    assert float(l2_distance(x, y).min()) > 0
    np.testing.assert_allclose(np.asarray(dssim_distance(x, x)), 0.0, atol=1e-5)
    assert float(dssim_distance(x, y).min()) > 0


def test_dssim_matches_skimage_default():
    """Golden vs an independent scipy replica of skimage structural_similarity
    DEFAULTS (7x7 uniform window, sample covariance, reflect-pad + border
    crop) — the exact delegate of the reference DSSIM fake net
    (networks_basic.py:167-174 -> eval_models/__init__.py:52-53)."""
    from scipy.ndimage import uniform_filter

    def skimage_ssim_2d(a, b, data_range=255.0, win=7):
        a = a.astype(np.float64)
        b = b.astype(np.float64)
        filt = lambda v: uniform_filter(v, size=win, mode="reflect")
        np_ = win * win
        cov_norm = np_ / (np_ - 1.0)
        ux, uy = filt(a), filt(b)
        vx = cov_norm * (filt(a * a) - ux * ux)
        vy = cov_norm * (filt(b * b) - uy * uy)
        vxy = cov_norm * (filt(a * b) - ux * uy)
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
            ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        pad = (win - 1) // 2
        return s[pad:-pad, pad:-pad].mean()

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (1, 40, 40, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape), -1, 1).astype(np.float32)
    # reference path: tensor2im uint8 truncation, per-channel ssim, averaged
    xi = ((x[0] + 1.0) * 127.5).astype(np.uint8).astype(np.float64)
    yi = ((y[0] + 1.0) * 127.5).astype(np.uint8).astype(np.float64)
    want = (1.0 - np.mean([skimage_ssim_2d(xi[..., c], yi[..., c])
                           for c in range(3)])) / 2.0
    got = float(dssim_distance(jnp.asarray(x), jnp.asarray(y))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_score_2afc():
    d0 = np.array([0.1, 0.9, 0.5])
    d1 = np.array([0.9, 0.1, 0.5])
    gts = np.array([0.0, 1.0, 1.0])  # humans prefer d0, d1, (tie)
    # metric agrees on first two, tie counts 0.5 -> (1 + 1 + 0.5)/3
    assert score_2afc(d0, d1, gts) == pytest.approx(2.5 / 3)


def test_score_jnd_perfect_separation():
    ds = np.array([0.1, 0.2, 0.8, 0.9])
    sames = np.array([1, 1, 0, 0])
    assert score_jnd(ds, sames) == pytest.approx(1.0)


def test_ssim_gray_self_is_one():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (64, 48)).astype(np.uint8)
    assert ssim_gray(a, a) == pytest.approx(1.0, abs=1e-7)
    b = rng.integers(0, 255, (64, 48)).astype(np.uint8)
    assert ssim_gray(a, b) < 0.5


def test_mse_metric():
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 255, np.uint8)
    assert mse(a, a) == 0.0
    assert mse(a, b) == pytest.approx(1.0)


def test_inception_score_uniform_vs_peaked():
    n, c = 16, 10
    uniform = np.full((n, c), 1.0 / c)
    m_u, _ = inception_score(uniform)
    assert m_u == pytest.approx(1.0, abs=1e-6)
    # diverse but confident predictions -> higher IS
    peaked = np.full((n, c), 1e-6)
    for i in range(n):
        peaked[i, i % c] = 1.0
    peaked /= peaked.sum(1, keepdims=True)
    m_p, _ = inception_score(peaked)
    assert m_p > 5.0


def test_inception_v3_forward_shape():
    from hrviton_tpu.models import InceptionV3
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    variables = jax.jit(lambda k: model.init(k, x))(jax.random.PRNGKey(0))
    out = model.apply(variables, x)
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))
