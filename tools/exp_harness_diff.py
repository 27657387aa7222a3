#!/usr/bin/env python
"""Name the mechanism behind the 138/184/219 ms harness spread (r5).

Three ways of timing the SAME composed b4 pipeline disagree far beyond
noise (tools/exp_batch_cliff.py knobs):

  allsalt   salt weights+inputs per lax.map step      138 ms/batch
  stacked   bench.py: broadcast-stacked inputs,
            loop-invariant weights                     184
  inputsalt salt inputs only, loop-invariant weights   219

This compiles the three wrapper loops and diffs the XLA cost model and the
per-opcode output-bytes of the while-loop BODY — the opcode whose bytes
differ is the mechanism. Production serving has fixed weights and varying
inputs, so the honest bench harness is whichever of stacked/inputsalt is
closer to how a server would dispatch; allsalt is the suspect.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
       python tools/exp_harness_diff.py [batch]
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import tryon_forward

K = int(os.environ.get("EXP_ITERS", "10"))
FH, FW, CH, CW = 1024, 768, 256, 192
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


def hist(compiled):
    by_op = defaultdict(lambda: [0, 0])
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
        by_op[opcode][0] += 1
        by_op[opcode][1] += shape_bytes(line.split("=", 1)[1])
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(by_op), (cost.get("flops", 0), cost.get("bytes accessed", 0))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
        return jnp.asarray(_rng.standard_normal((b, FH, FW, c)), jnp.bfloat16)

    batch = {"cloth": arr(3), "cloth_mask": arr(1), "parse_agnostic": arr(13),
             "densepose": arr(3), "agnostic": arr(3)}

    def full(tv_, gv_, bt):
        ta = lambda i1, i2: tocg.apply(tv_, i1, i2, train=False)
        ga = lambda x, s: gen.apply(gv_, x, s, train=False,
                                    rngs={"noise": nk})
        out, _ = tryon_forward(ta, ga, bt, pcfg)
        return jnp.mean(out.astype(jnp.float32))

    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    def salted(tv_, gv_, bt, *, weights):
        def one(s):
            sw = jax.tree_util.tree_map(
                lambda x: x + s.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
                else x, (tv_, gv_) if weights else ((), ()))
            sb = jax.tree_util.tree_map(
                lambda x: x + s.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, bt)
            return full(sw[0] if weights else tv_,
                        sw[1] if weights else gv_, sb)
        return jnp.sum(jax.lax.map(one, salts))

    def stacked_fn(tv_, gv_, sb):
        return jnp.sum(jax.lax.map(lambda bb: full(tv_, gv_, bb), sb))

    stacked_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K, *x.shape)), batch)

    variants = {
        "allsalt": (jax.jit(lambda a, c, d: salted(a, c, d, weights=True)),
                    (tv, gv, batch)),
        "inputsalt": (jax.jit(lambda a, c, d: salted(a, c, d, weights=False)),
                      (tv, gv, batch)),
        "stacked": (jax.jit(stacked_fn), (tv, gv, stacked_b)),
    }

    hists, costs = {}, {}
    for name, (fn, args) in variants.items():
        compiled = fn.lower(*args).compile()
        hists[name], costs[name] = hist(compiled)
        fl, by = costs[name]
        print(f"{name:10s} cost model: {fl / K / 1e9:8.1f} GF/iter  "
              f"{by / K / 1e9:7.2f} GB/iter", flush=True)

    base = "allsalt"
    for other in ("inputsalt", "stacked"):
        print(f"\n=== opcode out-bytes per iter: {other} - {base} "
              f"(positive = {other} pays more) ===")
        ops = set(hists[base]) | set(hists[other])
        rows = []
        for op in ops:
            c0, y0 = hists[base].get(op, (0, 0))
            c1, y1 = hists[other].get(op, (0, 0))
            rows.append(((y1 - y0) / K, op, c0, y0 / K, c1, y1 / K))
        rows.sort(key=lambda r: -abs(r[0]))
        for d, op, c0, y0, c1, y1 in rows[:14]:
            print(f"  {op:24s} {base}: n={c0:4d} {y0 / 1e6:8.1f} MB   "
                  f"{other}: n={c1:4d} {y1 / 1e6:8.1f} MB   "
                  f"diff {d / 1e6:+8.1f} MB")


if __name__ == "__main__":
    main()
