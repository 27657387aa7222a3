"""Loss-suite tests: golden values vs torch where formulas are non-trivial."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hrviton_tpu import losses


def test_cross_entropy2d_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 8, 6, 13), dtype=np.float32)
    target = rng.integers(0, 13, size=(2, 8, 6)).astype(np.int32)
    ours = losses.cross_entropy2d(jnp.asarray(logits), jnp.asarray(target))
    theirs = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(target).long(), ignore_index=250)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_cross_entropy2d_resizes_logits_align_corners_true():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 4, 3, 5), dtype=np.float32)
    target = rng.integers(0, 5, size=(1, 8, 6)).astype(np.int32)
    ours = losses.cross_entropy2d(jnp.asarray(logits), jnp.asarray(target))
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2).copy())
    tl = F.interpolate(tl, size=(8, 6), mode="bilinear", align_corners=True)
    theirs = F.cross_entropy(tl, torch.from_numpy(target).long(), ignore_index=250)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_cross_entropy2d_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    target = jnp.asarray([[[0, 250], [250, 250]]], dtype=jnp.int32)
    # only one valid pixel, uniform logits -> loss = log(3)
    np.testing.assert_allclose(float(losses.cross_entropy2d(logits, target)),
                               np.log(3.0), rtol=1e-4)


def test_lsgan_loss_matches_mse():
    rng = np.random.default_rng(2)
    p1 = rng.standard_normal((2, 4, 3, 1), dtype=np.float32)
    p2 = rng.standard_normal((2, 2, 2, 1), dtype=np.float32)
    pred = [[jnp.asarray(p1)], [jnp.asarray(p2)]]
    ours = losses.lsgan_loss(pred, True)
    want = float(F.mse_loss(torch.from_numpy(p1), torch.ones_like(torch.from_numpy(p1)))
                 + F.mse_loss(torch.from_numpy(p2), torch.ones_like(torch.from_numpy(p2))))
    np.testing.assert_allclose(float(ours), want, rtol=1e-6)


@pytest.mark.parametrize("mode", ["hinge", "ls", "original", "w"])
@pytest.mark.parametrize("real,for_d", [(True, True), (False, True), (True, False)])
def test_gan_loss_matches_torch_formula(mode, real, for_d):
    if mode in ("hinge", "w") and not real and not for_d:
        pytest.skip("generator loss targets real only")
    rng = np.random.default_rng(3)
    scales = [rng.standard_normal((2, 4, 3, 1), dtype=np.float32),
              rng.standard_normal((2, 2, 2, 1), dtype=np.float32)]
    pred = [[jnp.asarray(s)] for s in scales]
    ours = float(losses.gan_loss(pred, real, mode=mode, for_discriminator=for_d))

    def torch_one(x):
        x = torch.from_numpy(x)
        if mode == "original":
            t = torch.full_like(x, 1.0 if real else 0.0)
            return F.binary_cross_entropy_with_logits(x, t)
        if mode == "ls":
            t = torch.full_like(x, 1.0 if real else 0.0)
            return F.mse_loss(x, t)
        if mode == "hinge":
            if for_d:
                z = torch.zeros_like(x)
                m = torch.min(x - 1, z) if real else torch.min(-x - 1, z)
                return -m.mean()
            return -x.mean()
        return -x.mean() if real else x.mean()

    want = float(sum(torch_one(s) for s in scales) / len(scales))
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_tv_loss_matches_torch():
    rng = np.random.default_rng(4)
    f = rng.standard_normal((2, 8, 6, 2), dtype=np.float32)
    ours = float(losses.tv_loss(jnp.asarray(f)))
    t = torch.from_numpy(f)
    want = float(torch.abs(t[:, 1:] - t[:, :-1]).mean() +
                 torch.abs(t[:, :, 1:] - t[:, :, :-1]).mean())
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_flow_tv_suite_variants_run():
    rng = np.random.default_rng(5)
    flows = [jnp.asarray(rng.standard_normal((1, 4 * 2 ** i, 3 * 2 ** i, 2),
                                             dtype=np.float32))
             for i in range(5)]
    wcm = jnp.asarray(rng.uniform(0, 1, (1, 96, 72, 1)).astype(np.float32))
    a = losses.flow_tv_suite(flows)
    b = losses.flow_tv_suite(flows, lasttvonly=True)
    c = losses.flow_tv_suite(flows, wcm, edgeawaretv="last_only")
    d = losses.flow_tv_suite(flows, wcm, edgeawaretv="weighted", add_lasttv=True)
    for v in (a, b, c, d):
        assert np.isfinite(float(v))
    assert float(b) <= float(a)


def test_feature_matching_loss():
    rng = np.random.default_rng(6)
    fake = [[jnp.asarray(rng.standard_normal((1, 4, 3, 8), dtype=np.float32))
             for _ in range(3)] for _ in range(2)]
    real = [[jnp.asarray(rng.standard_normal((1, 4, 3, 8), dtype=np.float32))
             for _ in range(3)] for _ in range(2)]
    ours = float(losses.feature_matching_loss(fake, real, lambda_feat=10.0))
    want = 0.0
    for i in range(2):
        for j in range(2):  # last tap excluded
            want += float(np.abs(np.asarray(fake[i][j]) -
                                 np.asarray(real[i][j])).mean()) * 10.0 / 2
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_iou_metric_perfect_and_disjoint():
    a = jnp.ones((2, 4, 4, 3))
    assert float(losses.iou_metric(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = jnp.zeros((2, 4, 4, 3))
    assert float(losses.iou_metric(b, a)) == pytest.approx(0.0, abs=1e-4)


def test_vgg_loss_basic_properties():
    vgg = losses.make_vgg_loss(image_hw=(64, 48))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 64, 48, 3), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((1, 64, 48, 3), dtype=np.float32))
    assert float(vgg(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(vgg(x, y)) > 0
    # gradient flows to x only (y is stop-gradiented, networks.py:250)
    gx = jax.grad(lambda a: vgg(a, y))(x)
    assert float(jnp.abs(gx).sum()) > 0


def test_lpips_basic_properties():
    lp = losses.make_lpips(image_hw=(64, 64))
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    d_same = lp(x, x)
    d_diff = lp(x, y)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(jnp.abs(d_diff).sum()) > 0
