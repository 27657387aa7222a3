#!/usr/bin/env python
"""Per-scale dispatch sweep for the PIPELINED fused-block units
(ops/spade_block.py), composed bench. Analogous to exp_fs_sites.py: raise
spade_block._MIN_H to restrict the fused units to up_4 only (1024) or
up_4+up_3 (512) and compare against all-eligible (256) and off.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_fb_sites.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_ITERS", "10")
os.environ["BENCH_FUSED"] = "1"

import bench
from hrviton_tpu.ops import spade_block as sb


def main():
    for name, min_h in [("up_4 only (min_h=1024)", 1024),
                        ("up_4+up_3 (min_h=512)", 512),
                        ("all eligible (min_h=256)", 256)]:
        sb._MIN_H = min_h
        print(f"--- fused_block {name}", flush=True)
        bench.main()


if __name__ == "__main__":
    main()
