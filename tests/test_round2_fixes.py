"""Tests for the round-2 correctness/robustness fixes:

  * training CLIs refuse randomly-initialized loss backbones unless opted in
  * the interflow loss upsamples intermediate flows with cfg.upsample
    (train_condition.py:243), not a hardcoded mode
  * bf16 gaussian_blur matches the f32 blur (upcast path — parse labels must
    not flip at region boundaries vs the reference)
  * conv3x3_eligible keeps its shape/tiling gates in interpret mode
  * the dataset's 20->13 parse remap fails loudly on out-of-space labels and
    on truncating semantic_nc
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import jax
import jax.numpy as jnp

from hrviton_tpu.config import (CondDiscriminatorConfig, ConditionTrainConfig,
                                DataConfig, TOCGConfig)


# --------------------------------------------------------------- backbone gate

def test_check_pretrained_backbone_refuses():
    from hrviton_tpu.cli.common import check_pretrained_backbone
    with pytest.raises(SystemExit):
        check_pretrained_backbone("", what="VGG19", flag="--vgg_weights",
                                  allowed=False,
                                  allow_flag="--allow_random_vgg")


def test_check_pretrained_backbone_warns_when_allowed(capsys):
    from hrviton_tpu.cli.common import check_pretrained_backbone
    check_pretrained_backbone("", what="VGG19", flag="--vgg_weights",
                              allowed=True, allow_flag="--allow_random_vgg")
    assert "RANDOM" in capsys.readouterr().err
    # a provided path passes silently
    check_pretrained_backbone("/some/weights.msgpack", what="VGG19",
                              flag="--vgg_weights", allowed=False,
                              allow_flag="--allow_random_vgg")


def test_train_clis_register_allow_random_vgg():
    from hrviton_tpu.cli.train_condition import get_opt as cond_opt
    from hrviton_tpu.cli.train_generator import get_opt as gen_opt
    assert cond_opt(["--name", "x", "--allow_random_vgg"]).allow_random_vgg
    assert gen_opt(["--name", "x", "--allow_random_vgg"]).allow_random_vgg
    assert not cond_opt(["--name", "x"]).allow_random_vgg


# ------------------------------------------------- interflow upsample threading

class _StubTocg:
    """Deterministic (flow_list, seg, warped_c, warped_cm) so the only
    difference between trainers is the interflow resize mode."""

    def __init__(self, n, h, w):
        rng = np.random.default_rng(7)
        self.flows = [jnp.asarray(rng.standard_normal(
            (n, h >> (4 - i), w >> (4 - i), 2)) * 3.0, jnp.float32)
            for i in range(5)]
        self.seg = jnp.asarray(rng.standard_normal((n, h, w, 13)), jnp.float32)
        self.wc = jnp.asarray(rng.standard_normal((n, h, w, 3)), jnp.float32)
        self.wcm = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1)), jnp.float32)

    def apply(self, variables, i1, i2, train=False, mutable=False, **kw):
        return (self.flows, self.seg, self.wc, self.wcm), {}


def _interflow_losses(upsample, vgg_vars):
    from hrviton_tpu.train.condition_trainer import ConditionTrainer, _prep

    h, w = 64, 64
    tcfg = ConditionTrainConfig(interflowloss=True, no_gan_loss=True)
    trainer = ConditionTrainer(TOCGConfig(ngf=8, upsample=upsample),
                               CondDiscriminatorConfig(input_nc=33, ndf=8),
                               tcfg)
    trainer.tocg = _StubTocg(2, h, w)

    rng = np.random.default_rng(0)
    f = lambda c: jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    labels = rng.integers(0, 13, (2, h, w)).astype(np.int32)
    parse = jnp.asarray(labels[..., None] == np.arange(13), dtype=jnp.float32)
    batch = {
        "cloth": {"paired": f(3)},
        "cloth_mask": {"paired": jnp.asarray(
            rng.uniform(0, 1, (2, h, w, 1)), jnp.float32)},
        "parse_agnostic": f(13), "densepose": f(3),
        "parse_onehot": jnp.asarray(labels), "parse": parse,
        "pcm": parse[..., 3:4], "parse_cloth": f(3),
    }
    prep = _prep(batch)
    _, (_, _, losses) = trainer._forward_and_losses(
        {}, {}, None, vgg_vars, prep, jax.random.PRNGKey(0), train=True)
    return {k: float(v) for k, v in losses.items()}


@pytest.fixture(scope="module")
def vgg_small():
    from hrviton_tpu.losses.perceptual import make_vgg_loss
    return make_vgg_loss(image_hw=(64, 48)).variables


def test_interflow_uses_cfg_upsample(vgg_small):
    bil = _interflow_losses("bilinear", vgg_small)
    near = _interflow_losses("nearest", vgg_small)
    # identical tocg outputs -> any delta comes from the interflow resize mode
    assert bil["l1_cloth"] != near["l1_cloth"]
    assert bil["vgg"] != near["vgg"]
    # ce/tv don't touch the interflow resize: unchanged
    assert bil["ce"] == near["ce"]
    assert bil["tv"] == near["tv"]


# ------------------------------------------------------------------- bf16 blur

def test_gaussian_blur_bf16_matches_f32():
    from hrviton_tpu.ops.blur import gaussian_blur
    rng = np.random.default_rng(3)
    x32 = rng.standard_normal((1, 64, 48, 13)).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    ref = gaussian_blur(jnp.asarray(x16, jnp.float32))  # same quantized input
    out = gaussian_blur(x16)
    assert out.dtype == jnp.bfloat16
    # identical up to the final bf16 rounding of the f32 result
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref.astype(jnp.bfloat16), np.float32),
                               rtol=0, atol=0)


# ----------------------------------------------------- conv3x3 interpret gates

def test_conv3x3_eligible_shape_gates_in_interpret(monkeypatch):
    import importlib
    c3 = importlib.import_module("hrviton_tpu.ops.conv3x3")
    monkeypatch.setattr(c3, "_INTERPRET", True)
    monkeypatch.setattr(c3, "_ENABLED", True)
    ok = lambda shape: c3.conv3x3_eligible(shape, (3, 3, 128, 128), (1, 1),
                                           (1, 1), jnp.bfloat16)
    assert ok((1, 64, 48, 128))
    assert not ok((1, 60, 48, 128))   # h % _TH != 0: grid would drop rows
    assert not ok((1, 8, 48, 128))    # h == _TH: both boundary branches fire
    assert not ok((1, 64, 44, 128))   # w % 8 != 0


# -------------------------------------------------------- im2col-free wgrad

@pytest.mark.parametrize("pre_act", [None, "relu", "leaky0.2"])
@pytest.mark.parametrize("h,use_bias", [(16, True), (10, True), (7, False)])
def test_taps_wgrad_matches_autodiff(pre_act, h, use_bias):
    """The scan-chunked tap wgrad must reproduce XLA autodiff exactly (incl.
    ragged row-chunk fallbacks and fused pre-activations)."""
    import importlib
    c3 = importlib.import_module("hrviton_tpu.ops.conv3x3")

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, h, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((7,)), jnp.float32) if use_bias else None

    def loss(fn):
        if use_bias:
            return lambda x_, w_, b_: jnp.sum(jnp.sin(fn(x_, w_, b_, pre_act)))
        return lambda x_, w_: jnp.sum(jnp.sin(fn(x_, w_, None, pre_act)))

    args = (x, w, b) if use_bias else (x, w)
    ref_grads = jax.grad(loss(c3._conv3x3_ref),
                         argnums=tuple(range(len(args))))(*args)
    with c3.taps_wgrad(True):
        out_t = c3.conv3x3(*args[:2], b, pre_act=pre_act)
        taps_grads = jax.grad(loss(lambda x_, w_, b_, pa: c3.conv3x3(
            x_, w_, b_, pre_act=pa)),
            argnums=tuple(range(len(args))))(*args)
    np.testing.assert_allclose(np.asarray(out_t),
                               np.asarray(c3._conv3x3_ref(x, w, b, pre_act)),
                               rtol=1e-6, atol=1e-6)
    for i, (g_ref, g_taps) in enumerate(zip(ref_grads, taps_grads)):
        np.testing.assert_allclose(np.asarray(g_taps), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"arg {i}")


def test_generator_train_step_taps_wgrad_matches():
    """Full stage-2 step with taps_wgrad on == off (same seeds)."""
    import dataclasses
    from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                    SPADEDiscriminatorConfig, SPADEGenConfig,
                                    TOCGConfig)
    from hrviton_tpu.losses.perceptual import make_vgg_loss
    from hrviton_tpu.models import ConditionGenerator
    from hrviton_tpu.train import GeneratorTrainer

    FH = FW = 128
    CH = CW = 64
    vgg_vars = make_vgg_loss(image_hw=(64, 48)).variables
    rng = np.random.default_rng(0)
    f = lambda c: jnp.asarray(
        rng.standard_normal((2, FH, FW, c), dtype=np.float32))
    labels = rng.integers(0, 13, (2, FH, FW)).astype(np.int32)
    parse = jnp.asarray(labels[..., None] == np.arange(13), dtype=jnp.float32)
    batch = {"cloth": f(3),
             "cloth_mask": jnp.asarray(
                 rng.uniform(0, 1, (2, FH, FW, 1)).astype(np.float32)),
             "parse_agnostic": f(13), "densepose": f(3), "agnostic": f(3),
             "image": f(3), "parse": parse, "parse_cloth": f(3)}

    def run(taps):
        tocg_cfg = TOCGConfig(ngf=8)
        tocg = ConditionGenerator(tocg_cfg)
        tv = tocg.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
                       train=False)
        trainer = GeneratorTrainer(
            SPADEGenConfig(ngf=8, fine_height=FH, fine_width=FW,
                           num_upsampling_layers="more"),
            SPADEDiscriminatorConfig(ndf=8),
            GeneratorTrainConfig(taps_wgrad=taps),
            PipelineConfig(fine_height=FH, fine_width=FW, cond_height=CH,
                           cond_width=CW), tocg_cfg)
        state = trainer.init(jax.random.PRNGKey(0))
        _, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1),
                                        {"vgg": vgg_vars, "tocg": tv})
        return {k: float(v) for k, v in metrics.items()}

    base, taps = run(False), run(True)
    for k in base:
        assert abs(base[k] - taps[k]) <= 1e-4 * (1 + abs(base[k])), (
            k, base[k], taps[k])


# ------------------------------------------------------------ parse remap guard

def _bare_dataset(semantic_nc=13, h=8, w=8):
    from hrviton_tpu.data.dataset import VitonHDDataset
    ds = object.__new__(VitonHDDataset)
    ds.cfg = DataConfig(semantic_nc=semantic_nc)
    ds.h, ds.w = h, w
    return ds


def test_parse_maps_rejects_unknown_labels():
    ds = _bare_dataset()
    labels = np.zeros((8, 8), np.uint8)
    labels[0, 0] = 77  # outside the 20-label space
    with pytest.raises(ValueError, match="77"):
        ds._parse_maps(labels)


def test_parse_maps_rejects_truncating_semantic_nc():
    ds = _bare_dataset(semantic_nc=7)
    with pytest.raises(ValueError, match="semantic_nc"):
        ds._parse_maps(np.zeros((8, 8), np.uint8))


def test_parse_maps_valid_labels_roundtrip():
    ds = _bare_dataset()
    labels = np.random.default_rng(0).integers(0, 20, (8, 8)).astype(np.uint8)
    onehot, idx = ds._parse_maps(labels)
    assert onehot.shape == (8, 8, 13)
    np.testing.assert_array_equal(onehot.sum(-1), 1.0)
    np.testing.assert_array_equal(onehot.argmax(-1), idx)
