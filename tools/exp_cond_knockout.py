#!/usr/bin/env python
"""Composed knockout attribution of the condition stage's ~20 ms glue.

profile_components.py r4: condition stage 76.0 ms vs isolated pieces
tocg 17.7 + blur-chain 5.0 + warp 32.9 = 55.6 — ~20 ms is unattributed
in-context cost. Per the measurement-hygiene rule (ROADMAP §4) only
composed-graph diffs attribute honestly: this times condition_forward
with one piece at a time replaced by a shape-preserving stub.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_cond_knockout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import PipelineConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.ops.blur import gaussian_blur
from hrviton_tpu.ops.grid_sample import grid_sample, make_grid
from hrviton_tpu.ops.parse import group_index_of_label13
from hrviton_tpu.ops.resize import interpolate, resize_flow
from hrviton_tpu.pipelines.tryon import compose_clothmask

B, K = 4, 10
FH, FW, CH, CW = 1024, 768, 256, 192
_rng = np.random.default_rng(0)


def arr(h, w, c, dtype=jnp.bfloat16):
    return jnp.asarray(_rng.standard_normal((B, h, w, c)), dtype)


def timeit(name, fn, *args):
    # salt EVERY floating leaf (incl. dict leaves — an unsalted dict lets
    # XLA hoist the whole loop-invariant pipeline out of the lax.map and
    # halves the measurement; the first run of this tool had that bug)
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            sa = jax.tree_util.tree_map(
                lambda x: x + s.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
                else x, a)
            out = fn(*sa)
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


def main():
    pcfg = PipelineConfig()
    tocg = ConditionGenerator(TOCGConfig(ngf=96))
    k = jax.random.PRNGKey(0)
    tv = bf16_params(jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, CH, CW, 4)), jnp.zeros((1, CH, CW, 16)),
        train=False))(k))
    batch = {"cloth": arr(FH, FW, 3), "cloth_mask": arr(FH, FW, 1),
             "parse_agnostic": arr(FH, FW, 13), "densepose": arr(FH, FW, 3)}

    def cond(tv_, b, *, use_tocg=True, use_blur=True, use_warp=True,
             use_down=True, use_argmax=True, use_onehot=True):
        cloth = b["cloth"]
        cm = (b["cloth_mask"] > 0.5).astype(cloth.dtype)
        if use_down:
            cloth_d = interpolate(cloth, size=(CH, CW), mode="bilinear")
            cm_d = interpolate(cm, size=(CH, CW), mode="nearest")
            pa_d = interpolate(b["parse_agnostic"], size=(CH, CW),
                               mode="nearest")
            dp_d = interpolate(b["densepose"], size=(CH, CW), mode="bilinear")
        else:
            cloth_d = cloth[:, ::4, ::4]
            cm_d = cm[:, ::4, ::4]
            pa_d = b["parse_agnostic"][:, ::4, ::4]
            dp_d = b["densepose"][:, ::4, ::4]
        i1 = jnp.concatenate([cloth_d, cm_d], -1)
        i2 = jnp.concatenate([pa_d, dp_d], -1)
        if use_tocg:
            flow_list, seg, _, wcm = tocg.apply(tv_, i1, i2, train=False)
        else:  # shape-preserving stub
            seg = jnp.tile(i2[..., :13], (1, 1, 1, 1)) * 0.1
            wcm = i1[..., 3:4]
            flow_list = [jnp.stack([i1[:, ::2 ** (4 - j), ::2 ** (4 - j), 0],
                                    i1[:, ::2 ** (4 - j), ::2 ** (4 - j), 1]],
                                   -1) * 3 for j in range(5)]
        seg = compose_clothmask(seg, wcm, pcfg.clothmask_composition)
        if use_blur:
            seg_full = interpolate(seg, size=(FH, FW), mode="bilinear")
            fpg = gaussian_blur(seg_full, (15, 15), (3.0, 3.0))
        else:
            fpg = interpolate(seg, size=(FH, FW), mode="nearest")
        if use_argmax:
            fake_parse = jnp.argmax(fpg, axis=-1)
        else:  # stub: cheap elementwise proxy keeping fpg live
            fake_parse = (jnp.sum(fpg, -1) > 0).astype(jnp.int32)
        if use_onehot:
            glabel = jnp.take(jnp.asarray(group_index_of_label13()),
                              fake_parse.astype(jnp.int32))
            parse7 = (glabel[..., None] ==
                      jnp.arange(7, dtype=jnp.int32)).astype(cloth.dtype)
        else:  # stub: skip LUT gather + 7-way one-hot
            parse7 = fpg[..., :7] + fake_parse[..., None].astype(cloth.dtype)
        if use_warp:
            flow_full = resize_flow(flow_list[-1], (FH, FW), mode="bilinear")
            fn = jnp.stack([flow_full[..., 0] / pcfg.flow_norm_w,
                            flow_full[..., 1] / pcfg.flow_norm_h], -1)
            warped = grid_sample(jnp.concatenate([cloth, cm], -1),
                                 make_grid(B, FH, FW) + fn,
                                 padding_mode="border")
        else:
            warped = jnp.concatenate([cloth, cm], -1) * 0.5
        return (jnp.mean(warped.astype(jnp.float32))
                + jnp.mean(parse7.astype(jnp.float32))[None, None, None, None])

    t_full = timeit("condition FULL", lambda a, b: cond(a, b), tv, batch)
    for tag, kw in [("no tocg (stub)", dict(use_tocg=False)),
                    ("no blur-chain (nearest, no gauss)", dict(use_blur=False)),
                    ("no warp (scaled copy)", dict(use_warp=False)),
                    ("no downsamples (strided)", dict(use_down=False)),
                    ("no argmax (sum proxy)", dict(use_argmax=False)),
                    ("no LUT+onehot (slice proxy)", dict(use_onehot=False)),
                    ("no parse path at all",
                     dict(use_argmax=False, use_onehot=False))]:
        t = timeit(f"condition {tag}", lambda a, b, kw=kw: cond(a, b, **kw),
                   tv, batch)
        print(f"  -> attributed: {1e3 * (t_full - t):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
