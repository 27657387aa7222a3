"""Compact (uint8) wire format + device expansion == the full f32 contract.

The compact path moves normalize / one-hot / pcm / parse_cloth math from the
host loader into the jitted graph (data/device.py); this asserts the two
formats agree key-by-key on real directory-layout data (synthetic fixture),
so CLIs can switch the hot loaders to compact with zero behavior change.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hrviton_tpu.config import DataConfig  # noqa: E402
from hrviton_tpu.data import (Loader, VitonHDDataset, collate,  # noqa: E402
                              expand_compact, make_synthetic_dataset)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("viton_compact")
    make_synthetic_dataset(str(r), n=2, w=96, h=128, modes=("train", "test"))
    return str(r)


def _cfg(root, mode="train"):
    return DataConfig(dataroot=root, datamode=mode,
                      data_list=f"{mode}_pairs.txt",
                      fine_height=128, fine_width=96)


@pytest.mark.parametrize("mode", ["train", "test", "test_gen"])
def test_compact_expansion_matches_full(root, mode):
    dm = "train" if mode == "train" else "test"
    full_ds = VitonHDDataset(_cfg(root, dm), mode=mode)
    comp_ds = VitonHDDataset(_cfg(root, dm), mode=mode, compact=True)
    full = collate([full_ds[i] for i in range(2)])
    comp = collate([comp_ds[i] for i in range(2)])

    dev = jax.tree_util.tree_map(
        jnp.asarray, {k: v for k, v in comp.items()
                      if k not in ("im_name", "c_name")})
    out = jax.jit(expand_compact)(dev)

    for k, v in full.items():
        if k in ("im_name", "c_name"):
            assert comp[k] == v
            continue
        got = out[k]
        if isinstance(v, dict):
            for kk in v:
                np.testing.assert_allclose(np.asarray(got[kk]), v[kk],
                                           atol=1e-6, err_msg=f"{k}/{kk}")
        else:
            np.testing.assert_allclose(np.asarray(got), v, atol=1e-6,
                                       err_msg=k)
    # nothing extra, nothing missing (strings excluded)
    assert set(out) == {k for k in full if k not in ("im_name", "c_name")}


def test_compact_loader_roundtrip(root):
    ds = VitonHDDataset(_cfg(root), mode="train", compact=True)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=1)
    try:
        b = loader.next_batch()
    finally:
        loader.close()
    assert b["image"].dtype == np.uint8
    assert b["parse_idx"].dtype == np.uint8
    assert b["cloth"]["paired"].dtype == np.uint8
    out = expand_compact(jax.tree_util.tree_map(
        jnp.asarray, {k: v for k, v in b.items()
                      if k not in ("im_name", "c_name")}))
    assert out["parse"].shape == (2, 128, 96, 13)
    assert out["parse_onehot"].dtype == jnp.int32
    assert float(jnp.max(out["image"])) <= 1.0


def test_compact_semantic_nc_pad(root):
    ds = VitonHDDataset(_cfg(root), mode="train", compact=True)
    s = ds[0]
    out = expand_compact(
        {"cloth": {"paired": jnp.asarray(s["cloth"]["paired"])[None]},
         "cloth_mask": {"paired": jnp.asarray(s["cloth_mask"]["paired"])[None]},
         "parse_idx": jnp.asarray(s["parse_idx"])[None],
         "parse_agnostic_idx": jnp.asarray(s["parse_agnostic_idx"])[None],
         "densepose": jnp.asarray(s["densepose"])[None],
         "pose": jnp.asarray(s["pose"])[None],
         "image": jnp.asarray(s["image"])[None]},
        semantic_nc=16)
    assert out["parse"].shape[-1] == 16
    assert float(jnp.sum(out["parse"][..., 13:])) == 0.0
