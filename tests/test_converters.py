"""Backbone-converter validation (VERDICT r1 item 5).

The tocg/SPADE/cond-D converters are parity-proven in
test_parity_reference.py; these tests close the gap for the torchvision-layout
backbone converters (convert_vgg19 / convert_alexnet / convert_vgg16 /
convert_squeezenet / convert_lpips_alex / convert_inception_v3), which a user
exercises exactly when supplying real pretrained weights.

torchvision is not installed, so each test constructs a torch module whose
state_dict replicates the torchvision key/shape layout exactly
(/root/reference/eval_models/pretrained_networks.py:6-181 builds its slices
from these same torchvision modules), random-initializes it, converts, and
asserts (a) the converted tree matches the Flax template structure exactly and
(b) forward outputs agree numerically through every tap.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from hrviton_tpu.models.backbones import (AlexNetFeatures, SqueezeNetFeatures,
                                          Vgg16Features, Vgg19Features)
from hrviton_tpu.train.checkpoint import (convert_alexnet, convert_lpips_alex,
                                          convert_squeezenet, convert_vgg16,
                                          convert_vgg19)

torch.manual_seed(0)


# ----------------------------------------------------------- torch replicas

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def _vgg_features(cfg):
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1),
                       tnn.ReLU(inplace=True)]
            cin = v
    return tnn.Sequential(*layers)


class _TVWrap(tnn.Module):
    """Bare torchvision-style container: state_dict keys 'features.<i>....'."""

    def __init__(self, features):
        super().__init__()
        self.features = features

    def taps(self, x, tap_idx):
        out = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in tap_idx:
                out.append(x)
        return out


def _alexnet_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
    )


class _Fire(tnn.Module):
    def __init__(self, cin, s, e1, e3):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, s, 1)
        self.squeeze_activation = tnn.ReLU(inplace=True)
        self.expand1x1 = tnn.Conv2d(s, e1, 1)
        self.expand1x1_activation = tnn.ReLU(inplace=True)
        self.expand3x3 = tnn.Conv2d(s, e3, 3, padding=1)
        self.expand3x3_activation = tnn.ReLU(inplace=True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([self.expand1x1_activation(self.expand1x1(x)),
                          self.expand3x3_activation(self.expand3x3(x))], 1)


def _squeezenet11_features():
    # torchvision squeezenet1_1 (ceil_mode pools; tap sizes chosen so
    # ceil == floor at 64x64 input)
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, stride=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
        _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256),
    )


# ------------------------------------------------------------------ helpers

def _flat_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)
        out[key] = tuple(leaf.shape)
    return out


def _assert_matches_template(module, converted, example):
    """Converted variables must match the Flax init template EXACTLY
    (same key paths, same shapes) — the restore_into-strict guarantee."""
    template = jax.eval_shape(module.init, jax.random.PRNGKey(0), example)
    ts, cs = _flat_shapes(template), _flat_shapes(converted)
    assert ts == cs, (
        f"missing: {sorted(set(ts) - set(cs))[:5]} "
        f"extra: {sorted(set(cs) - set(ts))[:5]} "
        f"shape-diff: {[(k, ts[k], cs[k]) for k in ts if k in cs and ts[k] != cs[k]][:5]}")


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _forward_parity(tmodel, tap_idx, fmodel, converter, n_taps, hw=64):
    x = np.random.default_rng(1).standard_normal((1, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        ttaps = tmodel.taps(torch.from_numpy(x.transpose(0, 3, 1, 2)), tap_idx)
    variables = converter(_np_sd(tmodel))
    _assert_matches_template(fmodel, variables, jnp.asarray(x))
    ftaps = fmodel.apply(variables, jnp.asarray(x))
    assert len(ftaps) == n_taps == len(ttaps)
    for i, (t, f) in enumerate(zip(ttaps, ftaps)):
        np.testing.assert_allclose(
            np.asarray(f), t.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-4, err_msg=f"tap {i}")


# -------------------------------------------------------------------- tests

def test_convert_vgg19_forward_parity():
    # VGGLoss slice boundaries: relu1_1/2_1/3_1/4_1/5_1 (networks.py:203-215)
    _forward_parity(_TVWrap(_vgg_features(_VGG19_CFG)), {1, 6, 11, 20, 29},
                    Vgg19Features(), convert_vgg19, 5)


def test_convert_vgg16_forward_parity():
    # LPIPS vgg16 slices: relu1_2/2_2/3_3/4_3/5_3 (pretrained_networks.py:139-180)
    _forward_parity(_TVWrap(_vgg_features(_VGG16_CFG)), {3, 8, 15, 22, 29},
                    Vgg16Features(), convert_vgg16, 5)


def test_convert_alexnet_forward_parity():
    # LPIPS alex slices: relu1..relu5 (pretrained_networks.py:6-55)
    _forward_parity(_TVWrap(_alexnet_features()), {1, 4, 7, 9, 11},
                    AlexNetFeatures(), convert_alexnet, 5)


def test_convert_squeezenet_forward_parity():
    # LPIPS squeeze slices: 7 taps (pretrained_networks.py:6-55)
    _forward_parity(_TVWrap(_squeezenet11_features()),
                    {1, 4, 7, 9, 10, 11, 12},
                    SqueezeNetFeatures(), convert_squeezenet, 7)


def test_convert_lpips_alex_end_to_end():
    """Full LPIPS(net-lin, alex) parity: torch formulas from
    eval_models/networks_basic.py:27-120 vs LPIPSAlex with converted weights."""
    from hrviton_tpu.losses.lpips import LPIPSAlex

    alex = _TVWrap(_alexnet_features())
    chans = [64, 192, 384, 256, 256]
    lin_sd = {f"lin{i}.model.1.weight":
              np.abs(np.random.default_rng(2 + i).standard_normal(
                  (1, c, 1, 1)).astype(np.float32))
              for i, c in enumerate(chans)}

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    y = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    # torch reference computation (ScalingLayer -> taps -> unit-normalize ->
    # 1x1 lin conv -> spatial mean -> sum)
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def tlpips(a, b):
        ta = (torch.from_numpy(a.transpose(0, 3, 1, 2)) - shift) / scale
        tb = (torch.from_numpy(b.transpose(0, 3, 1, 2)) - shift) / scale
        taps_a = alex.taps(ta, {1, 4, 7, 9, 11})
        taps_b = alex.taps(tb, {1, 4, 7, 9, 11})
        total = 0.0
        for i in range(5):
            na = taps_a[i] / (taps_a[i].norm(dim=1, keepdim=True) + 1e-10)
            nb = taps_b[i] / (taps_b[i].norm(dim=1, keepdim=True) + 1e-10)
            diff = (na - nb) ** 2
            w = torch.from_numpy(lin_sd[f"lin{i}.model.1.weight"])
            d = torch.nn.functional.conv2d(diff, w)
            total = total + d.mean(dim=(2, 3))
        return total[:, 0]

    with torch.no_grad():
        expect = tlpips(x, y).numpy()

    variables = convert_lpips_alex(lin_sd, _np_sd(alex))
    model = LPIPSAlex()
    _assert_matches_template_pair(model, variables, jnp.asarray(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, expect, atol=2e-5, rtol=2e-4)


def _assert_matches_template_pair(module, converted, example):
    template = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                              example, example)
    ts, cs = _flat_shapes(template), _flat_shapes(converted)
    assert ts == cs, (sorted(set(ts) ^ set(cs))[:8])


def test_convert_inception_v3_template_strict():
    """Synthesize a torchvision-layout inception_v3 state_dict (every
    '<prefix>.conv.weight'/.bn.* plus fc) from the known torchvision naming
    and assert the converter fills the InceptionV3 template exactly."""
    from hrviton_tpu.models.inception import InceptionV3, convert_inception_v3

    model = InceptionV3()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jax.ShapeDtypeStruct((1, 299, 299, 3),
                                                   jnp.float32))
    # torchvision's documented top-level module names
    tv_top = {
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
        "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
        "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a",
        "Mixed_7b", "Mixed_7c", "fc"}
    assert set(template["params"].keys()) == tv_top

    rng = np.random.default_rng(0)
    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            template["params"])[0]:
        keys = [getattr(p, "key") for p in path]
        if keys[-2:] == ["conv", "kernel"]:
            tkey = ".".join(keys[:-2]) + ".weight"  # '<pre>.conv.weight'
            arr = rng.standard_normal(
                (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1]))
        elif keys == ["fc", "kernel"]:
            tkey, arr = "fc.weight", rng.standard_normal(leaf.shape[::-1])
        elif keys == ["fc", "bias"]:
            tkey, arr = "fc.bias", rng.standard_normal(leaf.shape)
        elif keys[-2] == "bn":
            pre = ".".join(keys[:-2]) + ".bn."
            tkey = pre + {"scale": "weight", "bias": "bias"}[keys[-1]]
            arr = rng.standard_normal(leaf.shape)
        else:
            raise AssertionError(keys)
        sd[tkey] = arr.astype(np.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            template["batch_stats"])[0]:
        keys = [getattr(p, "key") for p in path]
        pre = ".".join(keys[:-2]) + ".bn."
        tkey = pre + {"mean": "running_mean", "var": "running_var"}[keys[-1]]
        sd[tkey] = rng.standard_normal(leaf.shape).astype(np.float32)
    # AuxLogits keys must be skipped, like the real checkpoint contains
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)

    converted = convert_inception_v3(sd)
    assert _flat_shapes(template) == _flat_shapes(converted)
    # spot-check a transpose: kernels land HWIO
    k = converted["params"]["Conv2d_1a_3x3"]["conv"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        k, sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0))
