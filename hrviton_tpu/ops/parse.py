"""Human-parse label remapping and one-hot utilities.

Encodes the two label regroupings of the reference pipeline:
  * 20-channel CIHP parse -> 13-channel training labels
    (/root/reference/cp_dataset.py:150-172)
  * 13-channel predicted segmap -> 7-channel SPADE conditioning labels
    (/root/reference/test_generator.py:188-203, train_generator.py:261-273)

Remaps are expressed as static 0/1 matrices applied with one einsum — a matmul
instead of a python scatter loop, so the regroup fuses into the surrounding jit.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "LABELS_20_TO_13", "LABELS_13_TO_7", "remap_matrix", "onehot",
    "remap_parse", "parse20_to_13", "parse13_to_7", "group_index_of_label20",
    "group_index_of_label13", "lut_lookup",
]

# 13-way training groups over the 20 CIHP labels (cp_dataset.py:150-164).
LABELS_20_TO_13 = {
    0: [0, 10],        # background
    1: [1, 2],         # hair
    2: [4, 13],        # face
    3: [5, 6, 7],      # upper
    4: [9, 12],        # bottom
    5: [14],           # left_arm
    6: [15],           # right_arm
    7: [16],           # left_leg
    8: [17],           # right_leg
    9: [18],           # left_shoe
    10: [19],          # right_shoe
    11: [8],           # socks
    12: [3, 11],       # noise
}

# 7-way SPADE conditioning groups over the 13 labels (test_generator.py:188-196).
LABELS_13_TO_7 = {
    0: [0],                      # background
    1: [2, 4, 7, 8, 9, 10, 11],  # paste
    2: [3],                      # upper
    3: [1],                      # hair
    4: [5],                      # left_arm
    5: [6],                      # right_arm
    6: [12],                     # noise
}


@functools.lru_cache(maxsize=None)
def remap_matrix(spec_name: str) -> np.ndarray:
    spec, src_n = {
        "20to13": (LABELS_20_TO_13, 20),
        "13to7": (LABELS_13_TO_7, 13),
    }[spec_name]
    mat = np.zeros((len(spec), src_n), dtype=np.float32)
    for dst, srcs in spec.items():
        for s in srcs:
            mat[dst, s] = 1.0
    return mat


def onehot(labels, num_classes: int):
    """(N, H, W) int labels -> (N, H, W, num_classes) float one-hot."""
    return jnp.asarray(
        labels[..., None] == jnp.arange(num_classes, dtype=labels.dtype),
        dtype=jnp.float32,
    )


def remap_parse(parse_onehot, spec_name: str):
    """(N, H, W, src) one-hot(ish) map -> grouped (N, H, W, dst) map."""
    mat = jnp.asarray(remap_matrix(spec_name))
    return jnp.einsum("ds,nhws->nhwd", mat, parse_onehot)


def parse20_to_13(labels20):
    """(N, H, W) int CIHP labels -> (N, H, W, 13) grouped one-hot."""
    return remap_parse(onehot(labels20, 20), "20to13")


def parse13_to_7(seg13_onehot):
    """(N, H, W, 13) one-hot segmap -> (N, H, W, 7) SPADE conditioning map."""
    return remap_parse(seg13_onehot, "13to7")


@functools.lru_cache(maxsize=None)
def group_index_of_label13() -> np.ndarray:
    """Lookup table: 13-label id -> 7-group id. For one-hot inputs,
    ``onehot(lut[labels], 7) == parse13_to_7(onehot(labels, 13))`` exactly —
    the LUT form is pure elementwise (no matmul, no 13-channel intermediate),
    which matters in the composed inference graph."""
    table = np.zeros((13,), dtype=np.int32)
    for dst, srcs in LABELS_13_TO_7.items():
        for s in srcs:
            table[s] = dst
    return table


def lut_lookup(labels, table) -> jnp.ndarray:
    """Elementwise small-table lookup: ``table[labels]`` without a gather.

    ``jnp.take`` at millions of points lowers to TPU scalar gather — measured
    25 ms/batch for the 13->7 LUT at 4x1024x768 in the composed inference
    graph (tools/exp_cond_knockout.py, round 4). A compare-select chain over
    the static table is pure VPU elementwise work (<1 ms at the same shape)
    and exact. Zero-valued entries fold into the initializer.
    """
    table = np.asarray(table)
    labels = labels.astype(jnp.int32)
    out = jnp.zeros(labels.shape, jnp.int32)
    for idx, val in enumerate(table.tolist()):
        if val:
            out = jnp.where(labels == idx, jnp.int32(val), out)
    return out


@functools.lru_cache(maxsize=None)
def group_index_of_label20() -> np.ndarray:
    """Lookup table: raw 20-label id -> 13-group id (the reference's
    ``parse_onehot`` CE target, cp_dataset.py:174-177)."""
    table = np.zeros((20,), dtype=np.int32)
    for dst, srcs in LABELS_20_TO_13.items():
        for s in srcs:
            table[s] = dst
    return table
