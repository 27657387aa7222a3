#!/usr/bin/env python
"""Host loader throughput: full f32 contract vs compact uint8 wire format.

Receipts for ROADMAP §5 / VERDICT r1 item 10. Synthetic 1024x768 data, one
worker (per-core number; real hosts scale with worker processes).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrviton_tpu.config import DataConfig
from hrviton_tpu.data import VitonHDDataset, make_synthetic_dataset

N = int(os.environ.get("BL_SAMPLES", "8"))


def main():
    root = os.path.join(tempfile.gettempdir(), "viton_loader_bench")
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_dataset(root, n=4, w=768, h=1024, modes=("train",))
    cfg = DataConfig(dataroot=root, datamode="train",
                     data_list="train_pairs.txt",
                     fine_height=1024, fine_width=768)
    for compact in (False, True):
        ds = VitonHDDataset(cfg, mode="train", compact=compact)
        ds[0]  # warm caches
        t0 = time.perf_counter()
        for i in range(N):
            ds[i % len(ds)]
        dt = (time.perf_counter() - t0) / N
        nbytes = sum(
            a.nbytes for a in _leaves(ds[0]))
        print(f"{'compact' if compact else 'full':8s} "
              f"{dt * 1e3:7.1f} ms/sample/core   wire {nbytes / 1e6:6.1f} MB")


def _leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        elif hasattr(v, "nbytes"):
            yield v


if __name__ == "__main__":
    main()
