"""Golden parity for the host-side preprocessing drawings vs the reference.

CPDataset.get_agnostic (cp_dataset.py:49-116) never touches self, so it can be
invoked unbound against our build_cloth_agnostic on identical inputs; same for
get_im_parse_agnostic (get_parse_agnostic.py:13-43).
"""

import sys
import types

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/reference")

# cp_dataset imports torch + torchvision.transforms at module scope; stub the
# torchvision bits (we only call the pure-PIL get_agnostic method)
if "torchvision" not in sys.modules or not hasattr(
        sys.modules.get("torchvision", None), "transforms"):
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tv.models = getattr(tv, "models", types.ModuleType("torchvision.models"))
    tv.transforms = types.ModuleType("torchvision.transforms")

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in ("Compose", "ToTensor", "Normalize", "Resize"):
        setattr(tv.transforms, name, _Stub)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms

from hrviton_tpu.data.agnostic import build_cloth_agnostic, build_parse_agnostic
from hrviton_tpu.data.synthetic import _draw_parse, _pose_points


# the reference hardcodes a (768, 1024) arm-mask canvas (cp_dataset.py:98), so
# exact comparison is only possible at full resolution
W, H = 768, 1024


def _fixture():
    rng = np.random.default_rng(0)
    im = Image.fromarray(rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
    parse = _draw_parse(W, H, rng)
    pose = _pose_points(W, H)[:, :2].astype(np.float64)
    return im, parse, pose


def test_cloth_agnostic_matches_reference():
    import cp_dataset

    im, parse, pose = _fixture()
    ours = build_cloth_agnostic(im.copy(), parse, pose.copy())
    theirs = cp_dataset.CPDataset.get_agnostic(None, im.copy(), parse,
                                               pose.copy())
    a = np.asarray(ours)
    b = np.asarray(theirs)
    assert a.shape == b.shape
    # PIL drawing is deterministic: require exact pixel equality
    mismatch = np.mean(a != b)
    assert mismatch == 0.0, f"{mismatch:.4%} pixels differ"


def test_parse_agnostic_matches_reference():
    import get_parse_agnostic as ref_tool

    _, parse, pose = _fixture()
    ours = build_parse_agnostic(parse, pose.copy(), w=W, h=H)
    theirs = ref_tool.get_im_parse_agnostic(parse, pose.copy(), w=W, h=H)
    a = np.asarray(ours)
    b = np.asarray(theirs)
    mismatch = np.mean(a != b)
    assert mismatch == 0.0, f"{mismatch:.4%} pixels differ"
