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


def main_workers():
    """Loader-level A/B: thread pool vs spawned process workers
    (--worker_processes CLI flag) on the 1024x768 compact train contract.

    NOTE this image has ONE host core (nproc=1), so neither mode can scale
    above 1x here — this measures the process-worker overhead (spawn + pickle
    of ~7 MB compact samples), not the parallel speedup the flag exists for.
    On a real multi-core TPU host the process pool scales with cores while
    the thread pool saturates at ~1.3x (GIL-bound PIL decode)."""
    from hrviton_tpu.data import Loader
    root = os.path.join(tempfile.gettempdir(), "viton_loader_bench")
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_dataset(root, n=4, w=768, h=1024, modes=("train",))
    cfg = DataConfig(dataroot=root, datamode="train",
                     data_list="train_pairs.txt",
                     fine_height=1024, fine_width=768)
    ds = VitonHDDataset(cfg, mode="train", compact=True)
    nw = int(os.environ.get("BL_WORKERS", "4"))
    nb = max(2, N // 2)
    for procs in (False, True):
        ld = Loader(ds, 2, shuffle=False, num_workers=nw,
                    worker_processes=procs)
        try:
            ld.next_batch()  # warm pools/caches
            t0 = time.perf_counter()
            for _ in range(nb):
                ld.next_batch()
            dt = (time.perf_counter() - t0) / (nb * 2)
            print(f"{'process' if procs else 'thread':8s} x{nw} workers "
                  f"{dt * 1e3:7.1f} ms/sample  "
                  f"({1.0 / dt:5.2f} samples/s on {os.cpu_count()} core)")
        finally:
            ld.close()


if __name__ == "__main__":
    if os.environ.get("BL_MODE", "dataset") == "workers":
        main_workers()
    else:
        main()
