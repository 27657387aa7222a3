#!/usr/bin/env python
"""Diff optimized-HLO memory traffic: composed pipeline vs its two stages.

exp_roofline.py showed the composed pipeline's XLA cost model charges ~50 GB
more "bytes accessed" than condition_forward + generator compiled separately
(272.7 vs 122.4 + 100.1 GB) — the measured +54 ms/batch. This tool compiles
the same three programs (cached) and prints the largest instructions by
output bytes, grouped by opcode, so the extra materialization is attributable.

Usage: python tools/exp_hlo_diff.py [cond|gen|full ...]
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import condition_forward, tryon_forward

B = 4
FH, FW = 1024, 768
_rng = np.random.default_rng(0)
_DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
             "pred": 1, "f16": 2, "s64": 8, "u64": 8, "s16": 2, "u16": 2}
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|s64|u64|s16|u16|pred)"
                       r"\[([\d,]*)\]")


def arr(h, w, c, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype)


def shape_bytes(text):
    """Total bytes of all shapes appearing before the '=' of an HLO line."""
    m = _SHAPE_RE.search(text)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _DT_BYTES[m.group(1)]


def analyze(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    txt = compiled.as_text()
    by_op = defaultdict(lambda: [0, 0])   # opcode -> [count, out_bytes]
    biggest = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\S+?)\[", line)
        if not m:
            continue
        # opcode comes after '=': e.g. "x = f32[...] fusion(...)"
        om = re.match(r"(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
        opcode = om.group(1) if om else "?"
        b = shape_bytes(line.split("=", 1)[1])
        by_op[opcode][0] += 1
        by_op[opcode][1] += b
        kind = ""
        if opcode == "fusion":
            km = re.search(r"kind=(\w+)", line)
            kind = f":{km.group(1)}" if km else ""
        biggest.append((b, f"{opcode}{kind}", line[:180]))
    print(f"\n=== {name} ===")
    for op, (cnt, byt) in sorted(by_op.items(), key=lambda kv: -kv[1][1]):
        if byt > 100e6:
            print(f"  {op:24s} n={cnt:5d}  out={byt / 1e9:8.2f} GB")
    biggest.sort(key=lambda t: -t[0])
    print("  -- largest single instructions --")
    for b, op, line in biggest[:20]:
        print(f"  {b / 1e6:9.1f} MB {op:18s} {line[:150]}")


def main():
    which = sys.argv[1:] or ["cond", "gen", "full"]
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    gen = SPADEGenerator(SPADEGenConfig(ngf=64))
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, 256, 192, 4)), jnp.zeros((1, 256, 192, 16)),
        train=False))(k))
    gv = bf16_params(jax.jit(lambda key: gen.init(
        {"params": key, "noise": key}, jnp.zeros((1, FH, FW, 9)),
        jnp.zeros((1, FH, FW, 7)), train=False))(k))
    nk = jax.random.PRNGKey(1)

    batch = {"cloth": arr(FH, FW, 3), "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13), "densepose": arr(FH, FW, 3),
             "agnostic": arr(FH, FW, 3)}
    gen_in, parse7 = arr(FH, FW, 9), arr(FH, FW, 7)

    def ta(tv_):
        return lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)

    def ga(gv_):
        return lambda x, s: gen.apply(gv_, x, s, train=False,
                                      rngs={"noise": nk})

    if "cond" in which:
        def cond(tv_, b):
            c = condition_forward(ta(tv_), b, pcfg)
            return c.warped_cloth, c.parse7
        analyze("condition_forward", cond, tv, batch)
    if "gen" in which:
        def g(gv_, gi, p7):
            return ga(gv_)(gi, p7)
        analyze("SPADE generator", g, gv, gen_in, parse7)
    if "full" in which:
        def full(tv_, gv_, b):
            out, _ = tryon_forward(ta(tv_), ga(gv_), b, pcfg)
            return out
        analyze("composed pipeline", full, tv, gv, batch)


if __name__ == "__main__":
    main()
