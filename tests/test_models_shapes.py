"""Shape/dtype/determinism tests for the model zoo (SURVEY.md §4 rebuild plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hrviton_tpu.config import (CondDiscriminatorConfig, SPADEDiscriminatorConfig,
                                SPADEGenConfig, TOCGConfig)
from hrviton_tpu.models import (CondMultiscaleDiscriminator, ConditionGenerator,
                                SPADEGenerator, SPADEMultiscaleDiscriminator)

# small-but-structurally-identical sizes for fast single-core-CPU tests; the
# condition pyramid needs H, W divisible by 32 (5 stride-2 levels), SPADE
# 'more'/'most' need divisibility by 64/128 — like the reference
COND_H, COND_W = 64, 64
FINE_H, FINE_W = 128, 128


@pytest.fixture(scope="module")
def tocg_setup():
    cfg = TOCGConfig(ngf=8)
    model = ConditionGenerator(cfg)
    key = jax.random.PRNGKey(0)
    in1 = jnp.zeros((2, COND_H, COND_W, 4))
    in2 = jnp.zeros((2, COND_H, COND_W, 16))
    variables = model.init(key, in1, in2, train=False)
    return model, variables, in1, in2


def test_tocg_output_contract(tocg_setup):
    model, variables, in1, in2 = tocg_setup
    flow_list, seg, warped_c, warped_cm = model.apply(
        variables, in1, in2, train=False)
    assert len(flow_list) == 5
    # flows are a coarse-to-fine pyramid: (H/32 ... H/2)
    for i, f in enumerate(flow_list):
        assert f.shape == (2, COND_H // 2 ** (5 - i), COND_W // 2 ** (5 - i), 2)
    assert seg.shape == (2, COND_H, COND_W, 13)
    assert warped_c.shape == (2, COND_H, COND_W, 3)
    assert warped_cm.shape == (2, COND_H, COND_W, 1)


def test_tocg_train_mode_updates_batch_stats(tocg_setup):
    model, variables, in1, in2 = tocg_setup
    _, mutated = model.apply(variables, in1 + 1.0, in2, train=True,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(a - b).sum()) > 0 for a, b in zip(after, before))


def test_tocg_deterministic_forward(tocg_setup):
    model, variables, in1, in2 = tocg_setup
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal(in1.shape, dtype=np.float32))
    x2 = jnp.asarray(rng.standard_normal(in2.shape, dtype=np.float32))
    a = model.apply(variables, x1, x2, train=False)[1]
    b = model.apply(variables, x1, x2, train=False)[1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tocg_encoder_warp_feature_variant():
    cfg = TOCGConfig(ngf=8, warp_feature="encoder")
    model = ConditionGenerator(cfg)
    in1 = jnp.zeros((1, COND_H, COND_W, 4))
    in2 = jnp.zeros((1, COND_H, COND_W, 16))
    variables = model.init(jax.random.PRNGKey(1), in1, in2, train=False)
    _, seg, _, _ = model.apply(variables, in1, in2, train=False)
    assert seg.shape == (1, COND_H, COND_W, 13)


@pytest.mark.parametrize("layers,expect_div", [("more", 64), ("most", 128)])
def test_spade_generator_shapes(layers, expect_div):
    fh = fw = expect_div * 2
    cfg = SPADEGenConfig(ngf=8, fine_height=fh, fine_width=fw,
                         num_upsampling_layers=layers)
    assert cfg.latent_hw == (2, 2)
    model = SPADEGenerator(cfg)
    x = jnp.zeros((1, fh, fw, 9))
    seg = jnp.zeros((1, fh, fw, 7))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, seg, train=False)
    out = model.apply(variables, x, seg, train=False,
                      rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (1, fh, fw, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


@pytest.mark.parametrize("layers,expect_div", [("more", 64), ("most", 128)])
def test_spade_generator_label_seg_equivalence(layers, expect_div):
    """The compact int label-map seg form (the composed-pipeline fast path,
    models/spade.py seg_for) must be BIT-identical to the full-res one-hot
    form: slice of a one-hot == one-hot of the slice, and same-size nearest
    interpolate is a no-op."""
    fh = fw = expect_div * 2
    cfg = SPADEGenConfig(ngf=8, fine_height=fh, fine_width=fw,
                         num_upsampling_layers=layers)
    model = SPADEGenerator(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, fh, fw, 9)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, (1, fh, fw)), dtype=jnp.int32)
    onehot = (labels[..., None] == jnp.arange(7, dtype=jnp.int32)) \
        .astype(jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, onehot, train=False)
    out_onehot = model.apply(variables, x, onehot, train=False,
                             rngs={"noise": jax.random.PRNGKey(2)})
    out_labels = model.apply(variables, x, labels, train=False,
                             rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(out_onehot),
                                  np.asarray(out_labels))


def test_spade_generator_rejects_normal_mode():
    cfg = SPADEGenConfig(ngf=8, num_upsampling_layers="normal")
    model = SPADEGenerator(cfg)
    with pytest.raises(ValueError, match="normal"):
        model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 32, 24, 9)), jnp.zeros((1, 32, 24, 7)),
                   train=False)


def test_cond_discriminator_multiscale_shapes():
    cfg = CondDiscriminatorConfig(input_nc=33, ndf=8)
    model = CondMultiscaleDiscriminator(cfg)
    x = jnp.zeros((2, COND_H, COND_W, 33))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out) == 2                      # num_D
    assert all(len(o) == 1 for o in out)      # getIntermFeat=False -> final only
    assert out[0][0].shape[0] == 2 and out[0][0].shape[-1] == 1
    # second entry consumed a downsampled input -> smaller patch map
    assert out[1][0].shape[1] < out[0][0].shape[1]


def test_cond_discriminator_spectral_dropout_variant():
    cfg = CondDiscriminatorConfig(input_nc=33, ndf=8, spectral=True,
                                  ddropout=True, ddownx2=True,
                                  get_interm_feat=True)
    model = CondMultiscaleDiscriminator(cfg)
    x = jnp.zeros((2, COND_H, COND_W, 33))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out, mutated = model.apply(variables, x, train=True, update_sn=True,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["aux"])
    assert len(out) == 2
    assert all(len(o) == 5 for o in out)      # n_layers + 2 feature taps
    assert "aux" in mutated                   # spectral u updated


def test_spade_discriminator_feature_taps():
    cfg = SPADEDiscriminatorConfig(ndf=8)
    model = SPADEMultiscaleDiscriminator(cfg)
    x = jnp.zeros((2, FINE_H, FINE_W, 10))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out) == 2
    for o in out:
        assert len(o) == 4                    # n_layers_D + 1 taps
        assert o[-1].shape[-1] == 1
