"""Golden-value tests: hrviton_tpu.ops vs torch-CPU reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from hrviton_tpu import ops


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def _nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("in_hw,out_hw,align", [
    ((256, 192), (1024, 768), False),
    ((1024, 768), (256, 192), False),
    ((8, 6), (16, 12), False),
    ((16, 12), (256, 192), True),
    ((37, 23), (64, 101), False),
])
def test_bilinear_interpolate_matches_torch(in_hw, out_hw, align):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = ops.interpolate(jnp.asarray(x), size=out_hw, mode="bilinear", align_corners=align)
    theirs = F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((1024, 768), (256, 192)),
    ((256, 192), (1024, 768)),
    ((33, 19), (64, 64)),
])
def test_nearest_interpolate_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 4), dtype=np.float32)
    ours = ops.interpolate(jnp.asarray(x), size=out_hw, mode="nearest")
    theirs = F.interpolate(_nchw(x), size=out_hw, mode="nearest")
    np.testing.assert_array_equal(np.asarray(ours), _nhwc(theirs))


def test_interpolate_scale_factor():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 6, 2), dtype=np.float32)
    ours = ops.interpolate(jnp.asarray(x), scale_factor=2, mode="bilinear")
    theirs = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear")
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch(padding_mode, align):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 24, 5), dtype=np.float32)
    # grid includes out-of-range coords to exercise padding behavior
    grid = rng.uniform(-1.4, 1.4, size=(2, 16, 12, 2)).astype(np.float32)
    ours = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid),
                           padding_mode=padding_mode, align_corners=align)
    theirs = F.grid_sample(_nchw(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode=padding_mode,
                           align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_grid_sample_identity():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 17, 13, 2), dtype=np.float32)
    grid = ops.make_grid(1, 17, 13)
    out = ops.grid_sample(jnp.asarray(x), grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-5)


def test_grid_sample_grad_flows_to_grid_and_input():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
    grid = ops.make_grid(1, 8, 8) * 0.9

    def loss(x, grid):
        return jnp.sum(ops.grid_sample(x, grid) ** 2)

    gx, gg = jax.grad(loss, argnums=(0, 1))(x, grid)
    assert float(jnp.abs(gx).sum()) > 0
    assert float(jnp.abs(gg).sum()) > 0


def test_flow_warp_matches_reference_formula():
    """flow_warp == grid_sample(x, grid + flow/norm) with reference normalization
    (networks.py:134-135)."""
    rng = np.random.default_rng(6)
    n, h, w = 2, 64, 48
    x = rng.standard_normal((n, h, w, 3), dtype=np.float32)
    flow = rng.standard_normal((n, h, w, 2), dtype=np.float32) * 3

    norm_w = (w / 2 - 1.0) / 2.0
    norm_h = (h / 2 - 1.0) / 2.0
    ours = ops.flow_warp(jnp.asarray(x), jnp.asarray(flow), norm_w, norm_h)

    tgrid_x = torch.linspace(-1, 1, w).view(1, 1, w, 1).expand(n, h, -1, -1)
    tgrid_y = torch.linspace(-1, 1, h).view(1, h, 1, 1).expand(n, -1, w, -1)
    tgrid = torch.cat([tgrid_x, tgrid_y], 3)
    tflow = torch.from_numpy(flow)
    tnorm = torch.cat([tflow[..., 0:1] / norm_w, tflow[..., 1:2] / norm_h], 3)
    theirs = F.grid_sample(_nchw(x), tnorm + tgrid, padding_mode="border",
                           align_corners=False)
    # f32 rounding in the normalize-add differs slightly from torch's eval order
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=2e-2, atol=1e-4)


def test_gaussian_blur_matches_torch_conv():
    """tgm.image.GaussianBlur parity: normalized separable kernel, zero padding."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 33, 29, 13), dtype=np.float32)
    ours = ops.gaussian_blur(jnp.asarray(x), (15, 15), (3.0, 3.0))

    k1 = torch.from_numpy(ops.gaussian_kernel1d(15, 3.0))
    k2d = torch.outer(k1, k1)
    c = x.shape[-1]
    kern = k2d.expand(c, 1, 15, 15)
    theirs = F.conv2d(_nchw(x), kern, padding=7, groups=c)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_avg_pool_nopad_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 31, 17, 3), dtype=np.float32)
    ours = ops.avg_pool2d_nopad(jnp.asarray(x))
    theirs = F.avg_pool2d(_nchw(x), 3, stride=2, padding=1, count_include_pad=False)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_parse_remap_matches_scatter_loop():
    rng = np.random.default_rng(9)
    labels = rng.integers(0, 20, size=(2, 16, 12)).astype(np.int32)
    ours13 = ops.parse20_to_13(jnp.asarray(labels))

    # torch-style scatter one-hot + python regroup loop (cp_dataset.py:166-172)
    parse_map = torch.zeros(2, 20, 16, 12)
    parse_map.scatter_(1, torch.from_numpy(labels).long().unsqueeze(1), 1.0)
    ref13 = torch.zeros(2, 13, 16, 12)
    for dst, srcs in ops.LABELS_20_TO_13.items():
        for s in srcs:
            ref13[:, dst] += parse_map[:, s]
    np.testing.assert_array_equal(np.asarray(ours13), _nhwc(ref13))

    # 13 -> 7 regroup on a one-hot built from an argmax
    seg13 = ops.onehot(jnp.asarray(rng.integers(0, 13, size=(2, 16, 12)).astype(np.int32)), 13)
    ours7 = ops.parse13_to_7(seg13)
    ref7 = torch.zeros(2, 7, 16, 12)
    seg13_t = _nchw(np.asarray(seg13))
    for dst, srcs in ops.LABELS_13_TO_7.items():
        for s in srcs:
            ref7[:, dst] += seg13_t[:, s]
    np.testing.assert_array_equal(np.asarray(ours7), _nhwc(ref7))


def test_group_index_table_matches_onehot_weighted_sum():
    table = ops.group_index_of_label20()
    for dst, srcs in ops.LABELS_20_TO_13.items():
        for s in srcs:
            assert table[s] == dst


def test_lut_lookup_matches_take():
    # gather-free compare-select LUT (tools/exp_cond_knockout.py r4: the
    # jnp.take form cost 25 ms/batch composed at 4x1024x768 on TPU)
    rng = np.random.default_rng(11)
    for table, n in [(ops.group_index_of_label13(), 13),
                     (ops.group_index_of_label20(), 20)]:
        labels = jnp.asarray(rng.integers(0, n, size=(2, 31, 17)), jnp.int32)
        ref = jnp.take(jnp.asarray(table), labels)
        got = ops.lut_lookup(labels, table)
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
