"""Data layer tests over the synthetic VITON-HD fixture."""

import numpy as np
import pytest

from hrviton_tpu.config import DataConfig
from hrviton_tpu.data import (Loader, VitonHDDataset, build_parse_agnostic,
                              collate, make_synthetic_dataset)

W, H = 96, 128  # small synthetic resolution (3:4 like the real data)


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("viton_synth")
    return make_synthetic_dataset(str(root), n=4, w=W, h=H)


def _cfg(dataroot, mode="train"):
    return DataConfig(dataroot=dataroot, datamode=mode,
                      data_list=f"{mode}_pairs.txt",
                      fine_height=H, fine_width=W)


def test_train_sample_contract(dataroot):
    ds = VitonHDDataset(_cfg(dataroot), mode="train")
    assert len(ds) == 4
    s = ds[0]
    assert s["cloth"]["paired"].shape == (H, W, 3)
    assert s["cloth_mask"]["paired"].shape == (H, W, 1)
    assert set(np.unique(s["cloth_mask"]["paired"])) <= {0.0, 1.0}
    assert s["parse"].shape == (H, W, 13)
    assert s["parse_agnostic"].shape == (H, W, 13)
    assert s["parse_onehot"].shape == (H, W)
    assert s["densepose"].shape == (H, W, 3)
    assert s["pose"].shape == (H, W, 3)
    assert s["agnostic"].shape == (H, W, 3)
    assert s["pcm"].shape == (H, W, 1)
    assert s["parse_cloth"].shape == (H, W, 3)
    assert s["image"].shape == (H, W, 3)
    # value ranges
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    # parse one-hot partitions the image
    np.testing.assert_allclose(s["parse"].sum(-1), 1.0)
    # pcm == upper-cloth channel
    np.testing.assert_array_equal(s["pcm"][..., 0], s["parse"][..., 3])
    # parse_onehot index consistent with 13ch argmax
    np.testing.assert_array_equal(s["parse_onehot"], s["parse"].argmax(-1))


def test_test_flavors(dataroot):
    ds = VitonHDDataset(_cfg(dataroot, "test"), mode="test")
    s = ds[1]
    assert "agnostic" not in s
    assert set(s["cloth"].keys()) == {"paired", "unpaired"}
    assert s["c_name"]["paired"] != s["c_name"]["unpaired"]

    ds_gen = VitonHDDataset(_cfg(dataroot, "test"), mode="test_gen")
    s2 = ds_gen[1]
    assert s2["agnostic"].shape == (H, W, 3)


def test_agnostic_grays_out_cloth_region(dataroot):
    ds = VitonHDDataset(_cfg(dataroot), mode="train")
    s = ds[0]
    # center of the torso should be gray (=~ 128/255*2-1 ≈ 0.0039) in agnostic
    cy, cx = H // 3, W // 2
    torso_px = s["agnostic"][cy, cx]
    assert np.all(np.abs(torso_px - 0.0039) < 0.02), torso_px
    # and differ from the original image there
    assert np.abs(s["image"][cy, cx] - torso_px).max() > 0.05


def test_build_parse_agnostic_removes_upper_labels(dataroot):
    from PIL import Image
    import os.path as osp
    import json
    base = osp.join(dataroot, "train")
    name = "00000_00"
    parse = Image.open(osp.join(base, "image-parse-v3", name + ".png"))
    with open(osp.join(base, "openpose_json", name + "_keypoints.json")) as f:
        pts = np.array(json.load(f)["people"][0]["pose_keypoints_2d"]
                       ).reshape(-1, 3)[:, :2]
    agn = build_parse_agnostic(parse, pts, w=W, h=H)
    arr = np.array(agn)
    assert not np.isin(arr, [5, 6, 7, 10]).any()


def test_loader_batches_and_restarts(dataroot):
    ds = VitonHDDataset(_cfg(dataroot), mode="train")
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    try:
        seen = 0
        for _ in range(5):  # 5 batches > one epoch (4 samples) -> auto restart
            b = loader.next_batch()
            assert b["image"].shape == (2, H, W, 3)
            assert b["cloth"]["paired"].shape == (2, H, W, 3)
            assert len(b["im_name"]) == 2
            seen += 1
        assert seen == 5
    finally:
        loader.close()


def test_loader_process_workers_match_threads(dataroot):
    """Spawn-context process workers must yield the identical batch stream as
    the thread pool (same seeded permutation, same reassembly order)."""
    ds = VitonHDDataset(_cfg(dataroot), mode="train")
    lt = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    lp = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7,
                worker_processes=True)
    try:
        for _ in range(3):
            bt, bp = lt.next_batch(), lp.next_batch()
            assert bt["im_name"] == bp["im_name"]
            np.testing.assert_array_equal(bt["image"], bp["image"])
            np.testing.assert_array_equal(bt["cloth"]["paired"],
                                          bp["cloth"]["paired"])
    finally:
        lt.close()
        lp.close()


def test_collate_nested():
    s = {"image": np.zeros((2, 2, 3)), "cloth": {"paired": np.ones((2, 2, 3))},
         "im_name": "a.jpg", "c_name": {"paired": "a.jpg"}}
    b = collate([s, s])
    assert b["image"].shape == (2, 2, 2, 3)
    assert b["cloth"]["paired"].shape == (2, 2, 2, 3)
    assert b["im_name"] == ["a.jpg", "a.jpg"]
    assert b["c_name"]["paired"] == ["a.jpg", "a.jpg"]
