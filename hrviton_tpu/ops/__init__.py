"""Primitive ops (L1 of the framework): torch-parity semantics, TPU-first lowering."""

from hrviton_tpu.ops.blur import gaussian_blur, gaussian_kernel1d
from hrviton_tpu.ops.conv3x3 import (conv3x3, enable_fast_conv, fast_conv,
                                     fast_conv_enabled)
from hrviton_tpu.ops.grid_sample import flow_warp, grid_sample, make_grid
from hrviton_tpu.ops.parse import (
    LABELS_13_TO_7,
    LABELS_20_TO_13,
    group_index_of_label13,
    group_index_of_label20,
    lut_lookup,
    onehot,
    parse13_to_7,
    parse20_to_13,
    remap_matrix,
    remap_parse,
)
from hrviton_tpu.ops.pool import avg_pool2d_nopad
from hrviton_tpu.ops.resize import interpolate, resize_flow

__all__ = [
    "gaussian_blur", "gaussian_kernel1d",
    "conv3x3", "enable_fast_conv", "fast_conv", "fast_conv_enabled",
    "flow_warp", "grid_sample", "make_grid",
    "LABELS_13_TO_7", "LABELS_20_TO_13", "group_index_of_label13",
    "group_index_of_label20", "lut_lookup", "onehot",
    "parse13_to_7", "parse20_to_13", "remap_matrix", "remap_parse",
    "avg_pool2d_nopad",
    "interpolate", "resize_flow",
]
