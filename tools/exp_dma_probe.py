#!/usr/bin/env python
"""Probe: is the fused-norm kernel DMA-bound? Same double-buffered row-band
DMA as ops/spade_fused.py but with the MXU/VPU work replaced by a trivial
band passthrough. If this alone costs ~15+ ms, the DMA path (not compute)
sets the 20 ms floor of the fused kernel."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

B, H, W, NH = 4, 1024, 768, 128
TH = int(os.environ.get("PROF_TH", "16"))
K = int(os.environ.get("PROF_ITERS", "10"))


def _kernel(actv_hbm, o_ref, tile, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    def fetch(slot, idx, start):
        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(actv_hbm.at[b, pl.ds(0, TH + 1)],
                                       tile.at[slot, pl.ds(1, TH + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * TH - 1, TH + 2)],
                tile.at[slot], sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == n_i - 1)
        def _():
            cp = pltpu.make_async_copy(
                actv_hbm.at[b, pl.ds(idx * TH - 1, TH + 1)],
                tile.at[slot, pl.ds(0, TH + 1)], sem.at[slot])
            cp.start() if start else cp.wait()

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)

    @pl.when(i + 1 < n_i)
    def _():
        fetch((i + 1) % 2, i + 1, True)

    slot = i % 2
    fetch(slot, i, False)
    o_ref[0] = tile[pl.ds(slot, 1), 1:TH + 1][0]


def probe(x):
    n, h, w, c = x.shape
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n, h // TH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TH, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, w, c), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x)


def main():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, NH)),
                    jnp.bfloat16)
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(x):
        def one(s):
            return jnp.mean(jnp.abs(probe(x + s.astype(x.dtype))
                                    ).astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(many(x))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    gb = (2 * x.size * 2 + x.size * 2) / 1e9   # dma read + out write (+abs read)
    print(f"DMA passthrough TH={TH}: {per * 1e3:.2f} ms "
          f"(~{gb / per:.0f} GB/s incl. readback pass)", flush=True)


if __name__ == "__main__":
    main()
