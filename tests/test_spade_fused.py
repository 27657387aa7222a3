"""Golden tests for the fused SPADE-norm modulation kernel (ops/spade_fused.py).

Runs the kernel in interpret mode on CPU and checks agreement with the
unfused SPADENorm path: the raw op vs its XLA reference, the SPADENorm module
with the fast path on vs off (same params, same outputs), the param-tree
identity that keeps checkpoints/converters oblivious, and the custom VJP.
"""

import os

os.environ["HRVITON_PALLAS_INTERPRET"] = "1"

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sf = importlib.import_module("hrviton_tpu.ops.spade_fused")

_rng = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _force_interpret_small_tiles(monkeypatch):
    # The env vars above only take effect if THIS file triggers the first
    # import of spade_fused; under full-suite runs another test imports it
    # first (via models/spade.py) and locks _TH/_INTERPRET at the defaults.
    # Force the module state explicitly so results are order-independent.
    monkeypatch.setattr(sf, "_INTERPRET", True)
    monkeypatch.setattr(sf, "_TH", 4)


def _arr(shape, scale=1.0, dtype=jnp.float32):
    return jnp.asarray(_rng.standard_normal(shape) * scale, dtype)


def _inputs(b=2, h=16, w=16, c=8, nh=128):
    x = _arr((b, h, w, c))
    noise = _arr((b, h, w, 1))
    nscale = _arr((c,), 0.1)
    actv = _arr((b, h, w, nh))
    wg = _arr((3, 3, nh, c), 0.05)
    bg = _arr((c,), 0.1)
    wb = _arr((3, 3, nh, c), 0.05)
    bb = _arr((c,), 0.1)
    return x, noise, nscale, actv, wg, bg, wb, bb


def test_fused_matches_reference():
    args = _inputs()
    got = sf.fused_spade_modulate(*args)
    want = sf._modulate_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_edge_rows():
    # constant activations expose wrong halo handling at the H borders
    args = list(_inputs(b=1, h=24, w=8, c=4))
    args[3] = jnp.ones_like(args[3])
    got = sf.fused_spade_modulate(*args)
    want = sf._modulate_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_vjp_matches_reference():
    args = _inputs(b=1, h=16, w=8, c=4)

    def f_fast(*a):
        return jnp.sum(jnp.sin(sf.fused_spade_modulate(*a)))

    def f_ref(*a):
        return jnp.sum(jnp.sin(sf._modulate_ref(*a)))

    g_fast = jax.grad(f_fast, argnums=tuple(range(8)))(*args)
    g_ref = jax.grad(f_ref, argnums=tuple(range(8)))(*args)
    for gf, gr in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-3)


def test_eligibility_gates():
    assert not sf.fused_spade_eligible((1, 16, 16, 8), 128, jnp.float32)
    with sf.fast_spade(True):
        assert sf.fused_spade_eligible((1, 16, 16, 8), 128, jnp.float32)
        # h not divisible by tile / h == tile / odd w / unaligned nhidden
        th = sf._TH
        assert not sf.fused_spade_eligible((1, th * 2 + 2, 16, 8), 128,
                                           jnp.float32)
        assert not sf.fused_spade_eligible((1, th, 16, 8), 128, jnp.float32)
        assert not sf.fused_spade_eligible((1, 16, 12, 8), 128, jnp.float32)
        assert not sf.fused_spade_eligible((1, 16, 16, 8), 96, jnp.float32)


def test_spade_norm_fused_equivalence():
    """SPADENorm with the fused path on == off, on the SAME param tree."""
    from hrviton_tpu.models.spade import SPADENorm

    m = SPADENorm(8, 7)
    x = _arr((2, 16, 16, 8))
    seg = _arr((2, 16, 16, 7))
    keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    v = m.init(keys, x, seg, train=False)
    with sf.fast_spade(True):
        v_fast = m.init(keys, x, seg, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_fast)
    for a, b_ in zip(jax.tree_util.tree_leaves(v),
                     jax.tree_util.tree_leaves(v_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def run():
        return m.apply(v, x, seg, train=False,
                       rngs={"noise": jax.random.PRNGKey(2)})

    base = run()
    with sf.fast_spade(True):
        fused = run()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_spade_block_fused_equivalence():
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
    with sf.fast_spade(True):
        fused = run()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_spade_norm_merged_gamma_beta_equivalence():
    """SPADENorm with HRVITON_MERGE_GB on == off, on the SAME param tree.

    The merged path runs conv_gamma/conv_beta as one output-concatenated 3x3
    conv (models/spade.py) — measured slower composed (kept as a knob), but it
    must stay exactly equivalent and checkpoint-compatible.
    """
    from hrviton_tpu.models import spade as spade_mod
    from hrviton_tpu.models.spade import SPADENorm

    m = SPADENorm(8, 7)
    x = _arr((2, 16, 16, 8))
    seg = _arr((2, 16, 16, 7))
    keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    v = m.init(keys, x, seg, train=False)
    spade_mod.enable_merge_gamma_beta(True)
    try:
        v_merged = m.init(keys, x, seg, train=False)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v_merged))
        for a, b_ in zip(jax.tree_util.tree_leaves(v),
                         jax.tree_util.tree_leaves(v_merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        merged = m.apply(v, x, seg, train=False,
                         rngs={"noise": jax.random.PRNGKey(2)})
    finally:
        spade_mod.enable_merge_gamma_beta(False)
    base = m.apply(v, x, seg, train=False,
                   rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(merged), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
