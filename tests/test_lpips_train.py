"""LPIPS lin-head training parity (C13 training path,
/root/reference/eval_models/dist_model.py:115-210, networks_basic.py:114-141).

Golden tests build torch replicas per the reference spec (the
test_converters.py pattern — torchvision-free layout twins), copy weights into
the Flax modules, and compare numerics; the training test checks the full
jitted step actually learns a synthetic 2AFC task and honors clamp_weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from hrviton_tpu.losses.lpips_train import (Dist2LogitLayer, LPIPSHeadTrainer,
                                            bce_ranking_loss)

torch.manual_seed(0)
_rng = np.random.default_rng(0)


class _TorchDist2Logit(tnn.Module):
    """networks_basic.py:114-129 replica."""

    def __init__(self, chn_mid=32):
        super().__init__()
        self.model = tnn.Sequential(
            tnn.Conv2d(5, chn_mid, 1), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(chn_mid, chn_mid, 1), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(chn_mid, 1, 1), tnn.Sigmoid())

    def forward(self, d0, d1, eps=0.1):
        return self.model(torch.cat(
            (d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)), dim=1))


def _port(tmod):
    """torch replica weights -> Flax Dist2LogitLayer param tree."""
    convs = [m for m in tmod.model if isinstance(m, tnn.Conv2d)]
    tree = {}
    for i, c in enumerate(convs):
        tree[f"fc{i}"] = {"conv": {
            "kernel": jnp.asarray(c.weight.detach().numpy()
                                  .transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(c.bias.detach().numpy())}}
    return {"params": tree}


def test_dist2logit_and_bce_golden():
    tmod = _TorchDist2Logit()
    d0 = _rng.random((8,), dtype=np.float32) * 0.5
    d1 = _rng.random((8,), dtype=np.float32) * 0.5
    judge = _rng.random((8,), dtype=np.float32)

    t_logit = tmod(torch.from_numpy(d0).view(-1, 1, 1, 1),
                   torch.from_numpy(d1).view(-1, 1, 1, 1))
    # dist_model.py:158-163: rankLoss(d0, d1, judge*2-1); BCERankingLoss maps
    # per=(judge+1)/2 back to the raw judge
    t_loss = tnn.BCELoss()(t_logit,
                           torch.from_numpy(judge).view(-1, 1, 1, 1))

    f_logit = Dist2LogitLayer().apply(_port(tmod), jnp.asarray(d0),
                                      jnp.asarray(d1))
    f_loss = bce_ranking_loss(f_logit, jnp.asarray(judge))

    np.testing.assert_allclose(np.asarray(f_logit),
                               t_logit.detach().numpy().ravel(), atol=1e-6)
    np.testing.assert_allclose(float(f_loss), float(t_loss), atol=1e-6)


def test_accuracy_formula():
    # dist_model.py:169-172 compute_accuracy
    d0 = np.array([0.1, 0.9, 0.4], np.float32)
    d1 = np.array([0.5, 0.2, 0.4], np.float32)
    judge = np.array([1.0, 1.0, 0.5], np.float32)
    d1_lt_d0 = (d1 < d0).astype(np.float32)
    want = (d1_lt_d0 * judge + (1 - d1_lt_d0) * (1 - judge)).mean()
    assert want == pytest.approx((0.0 + 1.0 + 0.5) / 3)


@pytest.mark.slow
def test_head_training_learns_and_clamps():
    trainer = LPIPSHeadTrainer(net="alex", lr=1e-3, image_hw=(64, 64),
                               rng=jax.random.PRNGKey(1))
    B = 8

    def batch(seed):
        r = np.random.default_rng(seed)
        ref = r.standard_normal((B, 64, 64, 3), np.float32).clip(-1, 1)
        # p0 = tiny perturbation (humans prefer it: judge=0),
        # p1 = heavy perturbation
        p0 = np.clip(ref + 0.02 * r.standard_normal(ref.shape, np.float32),
                     -1, 1)
        p1 = np.clip(ref + 0.8 * r.standard_normal(ref.shape, np.float32),
                     -1, 1)
        judge = np.zeros((B,), np.float32)
        return ref, p0, p1, judge

    first_loss, _ = trainer.train_step(*batch(0))
    losses, accs = [], []
    for i in range(30):
        loss, acc = trainer.train_step(*batch(i + 1))
        losses.append(loss)
        accs.append(acc)
    assert np.mean(losses[-5:]) < first_loss
    assert np.mean(accs[-5:]) > 0.9  # ordering is easy; heads must not flip it
    for k, head in trainer.params["model"].items():
        assert k.startswith("lin")
        assert float(jnp.min(head["conv"]["kernel"])) >= 0.0  # clamp_weights
    # lr decay bookkeeping (dist_model.py:200-208)
    lr1 = trainer.update_learning_rate(10)
    assert lr1 == pytest.approx(1e-3 - 1e-4)
    # trained heads merge back into a scoring-ready variables tree
    variables = trainer.trained_variables()
    assert "alex" in variables["params"] and "lin0" in variables["params"]
