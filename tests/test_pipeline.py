"""End-to-end try-on pipeline tests (SURVEY.md §3.1 minimum slice)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import jax
import jax.numpy as jnp

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import (compose_clothmask, condition_forward,
                                   remove_overlap, tryon_forward)

FINE_H, FINE_W = 128, 128   # 'more' divides by 64
COND_H, COND_W = 64, 64     # condition pyramid divides by 32


def _batch(n=1, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda c: jnp.asarray(
        rng.standard_normal((n, FINE_H, FINE_W, c), dtype=np.float32))
    return {
        "cloth": f(3),
        "cloth_mask": jnp.asarray(
            rng.uniform(0, 1, (n, FINE_H, FINE_W, 1)).astype(np.float32)),
        "parse_agnostic": f(13),
        "densepose": f(3),
        "agnostic": f(3),
    }


@pytest.fixture(scope="module")
def pipeline_setup():
    pcfg = PipelineConfig(fine_height=FINE_H, fine_width=FINE_W,
                          cond_height=COND_H, cond_width=COND_W)
    tocg = ConditionGenerator(TOCGConfig(ngf=8))
    gen = SPADEGenerator(SPADEGenConfig(ngf=8, fine_height=FINE_H,
                                        fine_width=FINE_W,
                                        num_upsampling_layers="more"))
    batch = _batch()
    k = jax.random.PRNGKey(0)
    tv = tocg.init(k, jnp.zeros((1, COND_H, COND_W, 4)),
                   jnp.zeros((1, COND_H, COND_W, 16)), train=False)
    gv = gen.init({"params": k, "noise": k},
                  jnp.zeros((1, FINE_H, FINE_W, 9)),
                  jnp.zeros((1, FINE_H, FINE_W, 7)), train=False)

    def tocg_apply(i1, i2):
        return tocg.apply(tv, i1, i2, train=False)

    def gen_apply(x, seg):
        return gen.apply(gv, x, seg, train=False,
                         rngs={"noise": jax.random.PRNGKey(7)})

    return pcfg, tocg_apply, gen_apply, batch


def test_condition_forward_contract(pipeline_setup):
    pcfg, tocg_apply, _, batch = pipeline_setup
    cond = condition_forward(tocg_apply, batch, pcfg)
    assert cond.fake_segmap.shape == (1, COND_H, COND_W, 13)
    assert cond.parse7.shape == (1, FINE_H, FINE_W, 7)
    assert cond.warped_cloth.shape == (1, FINE_H, FINE_W, 3)
    # parse7 is one-hot: sums to 1 everywhere
    np.testing.assert_allclose(np.asarray(cond.parse7.sum(-1)), 1.0, atol=1e-6)


def test_tryon_forward_jits_and_runs(pipeline_setup):
    pcfg, tocg_apply, gen_apply, batch = pipeline_setup
    fn = jax.jit(lambda b: tryon_forward(tocg_apply, gen_apply, b, pcfg)[0])
    out = fn(batch)
    assert out.shape == (1, FINE_H, FINE_W, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_occlusion_path(pipeline_setup):
    pcfg, tocg_apply, gen_apply, batch = pipeline_setup
    import dataclasses
    pcfg_occ = dataclasses.replace(pcfg, occlusion=True)
    out, cond = tryon_forward(tocg_apply, gen_apply, batch, pcfg_occ)
    assert out.shape == (1, FINE_H, FINE_W, 3)


def test_compose_clothmask_modes():
    rng = np.random.default_rng(1)
    seg = jnp.asarray(rng.standard_normal((1, 8, 6, 13), dtype=np.float32))
    wcm = jnp.asarray(rng.uniform(0, 1, (1, 8, 6, 1)).astype(np.float32))

    none = compose_clothmask(seg, wcm, "no_composition")
    np.testing.assert_array_equal(np.asarray(none), np.asarray(seg))

    wg = compose_clothmask(seg, wcm, "warp_grad")
    np.testing.assert_allclose(np.asarray(wg[..., 3:4]),
                               np.asarray(seg[..., 3:4] * wcm), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(wg[..., :3]), np.asarray(seg[..., :3]))

    dt = compose_clothmask(seg, wcm, "detach")
    hard = (np.asarray(wcm) > 0.5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(dt[..., 3:4]),
                               np.asarray(seg[..., 3:4]) * hard, rtol=1e-6)


def test_remove_overlap_matches_reference_formula():
    rng = np.random.default_rng(2)
    seg = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((1, 8, 6, 13), dtype=np.float32)), -1)
    wcm = jnp.asarray(rng.uniform(0, 1, (1, 8, 6, 1)).astype(np.float32))
    got = remove_overlap(seg, wcm)
    body = np.asarray(seg)[..., [1, 2, 5, 6, 7, 8, 9, 10, 11, 12]].sum(-1)[..., None]
    want = np.asarray(wcm) - body * np.asarray(wcm)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_mesh_sharded_tryon_matches_single_device(pipeline_setup):
    """Batch-sharded inference over the 8-device virtual mesh must equal the
    unsharded pipeline bit-for-bit (the serving-scale data-parallel path)."""
    from hrviton_tpu.core.mesh import batch_sharding, make_mesh, replicated

    pcfg, tocg_apply, gen_apply, _ = pipeline_setup
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    batch = _batch(n=8, seed=3)

    def run(b):
        out, _ = tryon_forward(tocg_apply, gen_apply, b, pcfg)
        return out

    single = jax.jit(run)(batch)

    mesh = make_mesh(devices[:8])
    shard = batch_sharding(mesh)
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard), batch)
    with mesh:
        sharded = jax.jit(run)(sharded_batch)

    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5, rtol=1e-5)
