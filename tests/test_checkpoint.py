"""Checkpoint round-trip tests (train/checkpoint.py msgpack pytrees).

The reference persists params-only torch state_dicts (networks.py:411-425);
our equivalent is msgpack'd flax state dicts with strict-key restore. These
tests pin the round-trip (shapes/dtypes/values) and the step-numbered resume
naming used by the training CLIs (--load_step semantics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrviton_tpu.train.checkpoint import (load_pytree, restore_into,
                                          save_pytree)


def _tree():
    return {
        "params": {
            "conv": {"kernel": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
                     "bias": jnp.ones((4,), jnp.float32)},
            "norm": {"scale": jnp.full((4,), 2.0, jnp.bfloat16)},
        },
        "aux": {"u": jnp.linspace(0, 1, 5, dtype=jnp.float32)},
    }


def test_save_restore_roundtrip(tmp_path):
    tree = _tree()
    path = os.path.join(tmp_path, "ckpt", "model_step_000123.ckpt")
    save_pytree(tree, path)

    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = restore_into(template, path)
    flat_a = jax.tree_util.tree_leaves_with_path(tree)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (ka, a), (kb, b) in zip(flat_a, flat_b):
        assert ka == kb
        assert a.shape == b.shape, ka
        assert a.dtype == b.dtype, ka
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_restore_into_semantics(tmp_path):
    tree = _tree()
    path = os.path.join(tmp_path, "m.ckpt")
    save_pytree(tree, path)
    # extra keys in the checkpoint are tolerated (torch strict=False parity,
    # networks.py:419) — a params-only subset template loads fine
    subset = {"params": {"conv": {"kernel": jnp.zeros((2, 3, 4))}}}
    got = restore_into(subset, path)
    np.testing.assert_array_equal(np.asarray(got["params"]["conv"]["kernel"]),
                                  np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    # but a template key absent from the checkpoint is an error
    extra = dict(_tree(), extra_branch={"w": jnp.zeros((2,))})
    with pytest.raises(ValueError):
        restore_into(extra, path)


def test_load_pytree_raw_dict(tmp_path):
    path = os.path.join(tmp_path, "m.ckpt")
    save_pytree(_tree(), path)
    raw = load_pytree(path)
    assert set(raw) == {"params", "aux"}
    assert raw["params"]["norm"]["scale"].dtype == jnp.bfloat16


def test_trainer_state_roundtrip(tmp_path):
    """Generator variables survive save/load exactly (the CLIs' resume path)."""
    from hrviton_tpu.config import SPADEGenConfig
    from hrviton_tpu.models import SPADEGenerator

    gen = SPADEGenerator(SPADEGenConfig(ngf=8, fine_height=64, fine_width=64,
                                        num_upsampling_layers="more"))
    v = gen.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)},
                 jnp.zeros((1, 64, 64, 9)), jnp.zeros((1, 64, 64, 7)),
                 train=False)
    path = os.path.join(tmp_path, "gen_step_000010.ckpt")
    save_pytree(v, path)
    template = jax.tree_util.tree_map(jnp.zeros_like, v)
    v2 = restore_into(template, path)
    x = jnp.ones((1, 64, 64, 9))
    seg = jnp.ones((1, 64, 64, 7))
    out1 = gen.apply(v, x, seg, train=False, rngs={"noise": jax.random.PRNGKey(2)})
    out2 = gen.apply(v2, x, seg, train=False, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
