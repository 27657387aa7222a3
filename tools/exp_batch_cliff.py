#!/usr/bin/env python
"""Diagnose the batch-scaling cliff: b8 = 15.94 vs b4 = 18.56 img/s (r4).

VERDICT r4 weak-#1: batch scaling DEGRADES per-chip throughput and the only
recorded explanation is "the non-b4 layouts degrade the XLA stages, not the
kernel" — an observation, not an attribution. This tool names the opcodes:

  1. times the composed pipeline and its two stages at each batch size
     (same lax.map salted harness as profile_components.py), per-image;
  2. compiles the composed graph at each batch and diffs XLA's cost model
     (flops / bytes accessed, per image) and the per-opcode output-bytes
     histogram (exp_hlo_diff.py parsing) — an opcode whose per-image bytes
     GROW with batch is where a layout/fusion was lost.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
       python tools/exp_batch_cliff.py [batches...]   (default: 4 8)
"""

import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import condition_forward, tryon_forward

K = int(os.environ.get("EXP_ITERS", "10"))
FH, FW = 1024, 768
CH, CW = 256, 192
DTYPE = jnp.bfloat16
_rng = np.random.default_rng(0)

_DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
             "pred": 1, "f16": 2, "s64": 8, "u64": 8, "s16": 2, "u16": 2}
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|s64|u64|s16|u16|pred)"
                       r"\[([\d,]*)\]")


def shape_bytes(text):
    m = _SHAPE_RE.search(text)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES[m.group(1)]


# Harness-sensitivity knobs (reconciling this tool's numbers with bench.py,
# which read b4 = 21.8 img/s where this harness reads 29.0):
#   EXP_SALT_WEIGHTS=0  salt only dict (batch) leaves, not the weight trees
#   EXP_STACKED=1       bench.py's harness verbatim: broadcast-stack K copies
#                       of the inputs and lax.map over the stacked axis
_SALT_WEIGHTS = bool(int(os.environ.get("EXP_SALT_WEIGHTS", "1")))
_STACKED = bool(int(os.environ.get("EXP_STACKED", "0")))


def timeit(name, b, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    nw = getattr(fn, "n_weight_args", 0)   # leading weight-tree args

    if _STACKED:
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (K, *x.shape)), args)

        @jax.jit
        def many(aa):
            def one(a):
                return jnp.mean(fn(*a).astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, aa))

        run_args = (stacked,)
    else:
        @jax.jit
        def many(*a):
            def one(s):
                sa = [jax.tree_util.tree_map(
                          lambda x: x + s.astype(x.dtype)
                          if (jnp.issubdtype(x.dtype, jnp.floating)
                              and x.ndim >= 4
                              and (_SALT_WEIGHTS or i >= nw)) else x,
                          x_top) for i, x_top in enumerate(a)]
                out = fn(*sa)
                return jnp.mean(out.astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, salts))

        run_args = args

    float(many(*run_args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*run_args))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"  {name:30s} {per * 1e3:9.2f} ms/batch  {per * 1e3 / b:7.2f} "
          f"ms/img  {b / per:7.2f} img/s", flush=True)
    return per


def opcode_hist(fn, *args):
    """opcode -> [count, out_bytes] of the optimized composed HLO."""
    compiled = jax.jit(fn).lower(*args).compile()
    by_op = defaultdict(lambda: [0, 0])
    biggest = []
    for line in compiled.as_text().splitlines():
        line = line.strip()
        om = re.match(r"(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
        if not om:
            continue
        opcode = om.group(1)
        if opcode == "fusion":
            km = re.search(r"kind=(\w+)", line)
            if km:
                opcode = f"fusion:{km.group(1)}"
        b = shape_bytes(line.split("=", 1)[1])
        by_op[opcode][0] += 1
        by_op[opcode][1] += b
        biggest.append((b, opcode, line[:150]))
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    biggest.sort(key=lambda t: -t[0])
    return dict(by_op), (cost.get("flops", 0), cost.get("bytes accessed", 0)), \
        biggest[:12]


def build(b):
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    gen = SPADEGenerator(SPADEGenConfig(ngf=64))
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k))
    gv = bf16_params(jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, FH, FW, 9)),
        jnp.zeros((1, FH, FW, 7)), train=False))(k))
    nk = jax.random.PRNGKey(1)

    def arr(c):
        return jnp.asarray(_rng.standard_normal((b, FH, FW, c)), DTYPE)

    batch = {"cloth": arr(3), "cloth_mask": arr(1), "parse_agnostic": arr(13),
             "densepose": arr(3), "agnostic": arr(3)}

    def ta(tv_):
        return lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)

    def ga(gv_):
        return lambda x, s: gen.apply(gv_, x, s, train=False,
                                      rngs={"noise": nk})

    def full(tv_, gv_, bt):
        out, _ = tryon_forward(ta(tv_), ga(gv_), bt, pcfg)
        return out
    full.n_weight_args = 2

    def cond(tv_, bt):
        c = condition_forward(ta(tv_), bt, pcfg)
        return c.warped_cloth * 0.5 + c.parse7[..., :1]
    cond.n_weight_args = 1

    def genonly(gv_, gi, p7):
        return ga(gv_)(gi, p7)
    genonly.n_weight_args = 1

    gen_in = jnp.asarray(_rng.standard_normal((b, FH, FW, 9)), DTYPE)
    parse7 = jnp.asarray(_rng.standard_normal((b, FH, FW, 7)), DTYPE)
    return (tv, gv, batch, gen_in, parse7, full, cond, genonly)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    hists, costs = {}, {}
    for b in batches:
        tv, gv, batch, gen_in, parse7, full, cond, genonly = build(b)
        print(f"\n=== batch {b} ===", flush=True)
        timeit("composed pipeline", b, full, tv, gv, batch)
        timeit("condition stage", b, cond, tv, batch)
        timeit("generator stage", b, genonly, gv, gen_in, parse7)
        hist, (flops, byt), biggest = opcode_hist(full, tv, gv, batch)
        hists[b], costs[b] = hist, (flops, byt)
        print(f"  cost model: {flops / b / 1e9:.1f} GF/img, "
              f"{byt / b / 1e9:.2f} GB/img", flush=True)
        print("  largest instructions:")
        for bb, op, line in biggest[:6]:
            print(f"    {bb / b / 1e6:8.1f} MB/img {op:18s} {line[:110]}")

    if len(batches) == 2:
        b0, b1 = batches
        print(f"\n=== per-opcode out-bytes/img: b{b1} - b{b0} "
              f"(positive = b{b1} pays more) ===")
        ops = set(hists[b0]) | set(hists[b1])
        rows = []
        for op in ops:
            c0, y0 = hists[b0].get(op, (0, 0))
            c1, y1 = hists[b1].get(op, (0, 0))
            rows.append((y1 / b1 - y0 / b0, op, c0, y0 / b0, c1, y1 / b1))
        rows.sort(key=lambda r: -abs(r[0]))
        for d, op, c0, y0, c1, y1 in rows[:14]:
            print(f"  {op:24s} b{b0}: n={c0:4d} {y0 / 1e6:8.1f} MB/img   "
                  f"b{b1}: n={c1:4d} {y1 / 1e6:8.1f} MB/img   "
                  f"diff {d / 1e6:+8.1f} MB/img")


if __name__ == "__main__":
    main()
