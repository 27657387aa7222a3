#!/usr/bin/env python
"""Per-site attribution of the fused-SPADE kernel's composed-pipeline loss.

ops/spade_fused.py wins ~3 ms/norm ISOLATED at up_4 shapes but the composed
bench LOSES with it enabled everywhere (15.68 vs 17.16 img/s, r4 re-measure).
This sweeps the dispatch gate (_MIN_H: 1024 = up_4's 3 norms only, 512 = up_4+
up_3, 256 = all eligible scales = the measured-loss config) and the row-tile
height to locate where the boundary cost (lost XLA cross-op fusion at the
kernel's edges) outweighs the in-kernel traffic win.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_fs_sites.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_ITERS", "10")

import bench
from hrviton_tpu.ops import spade_fused as sf


def main():
    configs = [
        ("baseline (fast_spade off)", False, 256, 16),
        ("up_4 only (min_h=1024)", True, 1024, 16),
        ("up_4 only, TH=8", True, 1024, 8),  # TH=32 fails the VMEM plan
        ("up_4+up_3 (min_h=512)", True, 512, 16),
        ("all scales (min_h=256)", True, 256, 16),
    ]
    for name, on, min_h, th in configs:
        sf.enable_fast_spade(on)
        sf._MIN_H = min_h
        sf.set_tile_rows(th)
        print(f"--- {name}", flush=True)
        bench.main()


if __name__ == "__main__":
    main()
