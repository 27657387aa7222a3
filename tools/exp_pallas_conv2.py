#!/usr/bin/env python
"""Experiment 5: Mosaic-friendly Pallas 3x3 conv formulations.

The v1 kernel (exp_pallas_conv.py) hung the Mosaic compiler for >20 min in its
mm9 configuration (9 unrolled shifted slices of a double-buffered VMEM scratch
tile, each feeding a dot_general). Two reformulations that keep per-kernel IR
small:

A) halo: XLA materializes overlapping row-tiles (B, nT, TH+2, Wp, C) — a cheap
   strided gather at HBM bandwidth — and the kernel is a *standard* blocked
   pallas_call (no manual DMA, no scratch): each grid step reads one halo tile
   and does 3 dot_generals (one per ky, contracting (3C) after a static
   sublane-roll trick is avoided by contracting per-(ky,kx) with fori_loop).

B) dma_loop: v1's manual-DMA double buffering, but the 9 taps run in a
   lax.fori_loop with dynamic (pl.ds) slices so the unrolled IR stays tiny.

Both validate against lax.conv in interpret mode on CPU (run with
JAX_PLATFORMS=cpu PALLAS_INTERPRET=1) and compile/time on TPU otherwise.
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("PALLAS_INTERPRET", "0")))
B = int(os.environ.get("PROF_BATCH", "4"))
K = int(os.environ.get("PROF_ITERS", "10"))
H = int(os.environ.get("PROF_H", "1024"))
W = int(os.environ.get("PROF_W", "768"))
C = int(os.environ.get("PROF_C", "128"))
_rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim == 4
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))
    float(many(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / K * 1e3:9.2f} ms", flush=True)


def arr(shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(_rng.standard_normal(shape) * scale, dtype=dtype)


def conv_xla(x, w, pad=1):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), ((pad, pad), (pad, pad)),
                                    dimension_numbers=dn)


# ---------------- variant A: halo tiles + standard blocked pallas ----------

def _kernel_halo(t_ref, w_ref, o_ref):
    # t_ref: (1, 1, TH+2, Wp, C); w_ref: (9, C, Cout); o_ref: (1, 1, TH, W, Cout)
    th = o_ref.shape[2]
    wout = o_ref.shape[3]
    cout = o_ref.shape[-1]

    # static slices of the REF (pure addressing) — value-slicing the loaded
    # tile forces 9 unaligned vector relayouts and blew up the Mosaic compile
    acc = jnp.zeros((th, wout, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = t_ref[0, 0, ky:ky + th, kx:kx + wout, :]
            acc = acc + jax.lax.dot_general(
                win, w_ref[3 * ky + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def conv_halo(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    nt = h // th
    wp = -(-(ww + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))
    # overlapping row tiles: (B, nT, TH+2, Wp, C)
    idx = (jnp.arange(nt) * th)[:, None] + jnp.arange(th + 2)[None, :]
    halos = xp[:, idx]                    # gather -> (B, nT, TH+2, Wp, C)
    wk = w.reshape(9, cin, cout)
    return pl.pallas_call(
        _kernel_halo,
        out_shape=jax.ShapeDtypeStruct((n, nt, th, ww, cout), x.dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, wp, cin), lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, th, ww, cout),
                               lambda b, i: (b, i, 0, 0, 0)),
        interpret=INTERPRET,
    )(halos, wk).reshape(n, h, ww, cout)


# ---------------- variant C: kx-shifts packed into channels via roll -------

def _kernel_roll(t_ref, w_ref, o_ref):
    # t_ref: (1,1,TH+2,Wp,C); w_ref: (3, 3C, Cout); o_ref: (1,1,TH,Wp,Cout)
    th = o_ref.shape[2]
    cout = o_ref.shape[-1]
    t = t_ref[0, 0]                          # aligned full-tile load
    if INTERPRET:
        left = jnp.roll(t, -1, axis=1)
        right = jnp.roll(t, 1, axis=1)
    else:
        # pltpu.roll requires non-negative shift; -1 == wp-1 (circular)
        left = pltpu.roll(t, shift=t.shape[1] - 1, axis=1)   # col j = t[j+1]
        right = pltpu.roll(t, shift=1, axis=1)               # col j = t[j-1]
    s = jnp.concatenate([left, t, right], axis=-1)   # (TH+2, Wp, 3C)
    acc = jnp.zeros((th, s.shape[1], cout), jnp.float32)
    for ky in range(3):
        acc = acc + jax.lax.dot_general(
            s[ky:ky + th], w_ref[ky],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def conv_roll(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    nt = h // th
    wp = -(-(ww + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))
    idx = (jnp.arange(nt) * th)[:, None] + jnp.arange(th + 2)[None, :]
    halos = xp[:, idx]                    # (B, nT, TH+2, Wp, C)
    # stacked-channel weights: s[j] = (t[j+1], t[j], t[j-1]) -> (kx=2, 1, 0)
    wk = jnp.concatenate([w[:, 2], w[:, 1], w[:, 0]], axis=1)  # (3, 3C, Cout)
    out = pl.pallas_call(
        _kernel_roll,
        out_shape=jax.ShapeDtypeStruct((n, nt, th, wp, cout), x.dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, wp, cin), lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec((3, 3 * cin, cout), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, th, wp, cout),
                               lambda b, i: (b, i, 0, 0, 0)),
        interpret=INTERPRET,
    )(halos, wk)
    # output col q lives at stacked col q+1
    return out[:, :, :, 1:1 + ww, :].reshape(n, h, ww, cout)


# ---------------- variant D: unshifted dots + f32 product rotate -----------

def _kernel_prodroll(t_ref, w_ref, o_ref):
    # t_ref: (1, TH+2, Wp, C); w_ref: (9, C, Cout); o_ref: (1, TH, Wp, Cout)
    th = o_ref.shape[1]
    wp = o_ref.shape[2]
    cout = o_ref.shape[-1]
    acc = jnp.zeros((th, wp, cout), jnp.float32)
    for ky in range(3):
        rows = t_ref[0, ky:ky + th]          # aligned (dim-0 slice of ref)
        for kx in range(3):
            p = jax.lax.dot_general(
                rows, w_ref[3 * ky + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kx == 0:
                acc = acc + p
            elif INTERPRET:
                acc = acc + jnp.roll(p, -kx, axis=1)
            else:
                # 32-bit rotate OK on f32 products; o[q] += p[q+kx]
                acc = acc + pltpu.roll(p, shift=wp - kx, axis=1)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv_prodroll(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    nt = h // th
    wp = -(-(ww + 2) // 8) * 8
    # left pad 1 so xp[q+kx] == x[q+kx-1]; o[q] = acc[q]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))
    idx = (jnp.arange(nt) * th)[:, None] + jnp.arange(th + 2)[None, :]
    halos = xp[:, idx].reshape(n * nt, th + 2, wp, cin)
    wk = w.reshape(9, cin, cout)
    out = pl.pallas_call(
        _kernel_prodroll,
        out_shape=jax.ShapeDtypeStruct((n * nt, th, wp, cout), x.dtype),
        grid=(n * nt,),
        in_specs=[
            pl.BlockSpec((1, th + 2, wp, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wp, cout), lambda i: (i, 0, 0, 0)),
        interpret=INTERPRET,
    )(halos, wk)
    return out[:, :, :ww, :].reshape(n, h, ww, cout)


# ---------------- variant B: manual DMA + fori_loop taps -------------------

def _kernel_dma(x_hbm, w_ref, o_ref, tile, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    n_i = pl.num_programs(1)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(idx * th, th + 2)], tile.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(i + 1 < n_i)
    def _():
        get_dma((i + 1) % 2, i + 1).start()

    get_dma(i % 2, i).wait()
    slot = i % 2
    cout = o_ref.shape[-1]
    wout = o_ref.shape[2]

    acc = jnp.zeros((th, wout, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = tile[pl.ds(slot, 1), ky:ky + th, kx:kx + wout, :][0]
            acc = acc + jax.lax.dot_general(
                win, w_ref[3 * ky + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv_dma(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    wp = -(-(ww + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))
    wk = w.reshape(9, cin, cout)
    return pl.pallas_call(
        _kernel_dma,
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, th, ww, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, th + 2, wp, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=INTERPRET,
    )(xp, wk)


# ---------------- variant E: manual DMA + prodroll body, no XLA pad --------

def _roll_p(p, kx, wv, col):
    """acc[q] += p[q + kx - 1] with zero boundary (q+kx-1 outside [0, wv))."""
    if kx == 1:
        return p
    if kx == 0:      # p[q-1]: roll down 1, col 0 invalid
        r = jnp.roll(p, 1, axis=1) if INTERPRET else pltpu.roll(p, 1, axis=1)
        return jnp.where(col == 0, 0.0, r)
    r = (jnp.roll(p, -1, axis=1) if INTERPRET
         else pltpu.roll(p, wv - 1, axis=1))     # p[q+1]: col wv-1 invalid
    return jnp.where(col == wv - 1, 0.0, r)


def _kernel_e(x_hbm, w_ref, o_ref, tile, sem):
    # x_hbm: (B, H, W, C) unpadded, ANY; w_ref: (9, C, Cout) VMEM
    # o_ref: (1, TH, W, Cout); tile: (2, TH+2, W, C) scratch
    # tile rows represent x rows [i*TH-1, i*TH+TH+1); out-of-range rows zeroed
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    cout = o_ref.shape[-1]
    n_i = pl.num_programs(1)

    def fetch(slot, idx, start):
        if not start:   # matching waits (byte counts must match the start)
            pass

        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(0, th + 1)],
                                       tile.at[slot, pl.ds(1, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                                       tile.at[slot], sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == n_i - 1)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                                       tile.at[slot, pl.ds(0, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)

    @pl.when(i + 1 < n_i)
    def _():
        fetch((i + 1) % 2, i + 1, True)

    slot = i % 2
    fetch(slot, i, False)

    @pl.when(i == 0)
    def _():
        tile[slot, 0] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    @pl.when(i == n_i - 1)
    def _():
        tile[slot, th + 1] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    acc = jnp.zeros((th, wv, cout), jnp.float32)
    for ky in range(3):
        rows = tile[pl.ds(slot, 1), ky:ky + th][0]      # aligned load
        for kx in range(3):
            p = jax.lax.dot_general(
                rows, w_ref[3 * ky + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + _roll_p(p, kx, wv, col)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv_e(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    wk = w.reshape(9, cin, cout)
    return pl.pallas_call(
        _kernel_e,
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, th, ww, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, th + 2, ww, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((2,)),],
        interpret=INTERPRET,
    )(x, wk)


# -------- variant E2: ky packed into channels (K=3C), kx via f32 rolls -----

def _kernel_e2(x_hbm, w_ref, o_ref, tile, sem):
    # x_hbm: (B, H, W, C) unpadded ANY; w_ref: (3, 3C, Cout) VMEM
    # o_ref: (1, TH, W, Cout); tile: (2, TH+2, W, C) scratch
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = o_ref.shape[1]
    wv = o_ref.shape[2]
    cout = o_ref.shape[-1]
    n_i = pl.num_programs(1)

    def fetch(slot, idx, start):
        @pl.when(idx == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(0, th + 1)],
                                       tile.at[slot, pl.ds(1, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(jnp.logical_and(idx > 0, idx < n_i - 1))
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 2)],
                                       tile.at[slot], sem.at[slot])
            cp.start() if start else cp.wait()

        @pl.when(idx == n_i - 1)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(idx * th - 1, th + 1)],
                                       tile.at[slot, pl.ds(0, th + 1)],
                                       sem.at[slot])
            cp.start() if start else cp.wait()

    @pl.when(i == 0)
    def _():
        fetch(0, 0, True)

    @pl.when(i + 1 < n_i)
    def _():
        fetch((i + 1) % 2, i + 1, True)

    slot = i % 2
    fetch(slot, i, False)

    @pl.when(i == 0)
    def _():
        tile[slot, 0] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    @pl.when(i == n_i - 1)
    def _():
        tile[slot, th + 1] = jnp.zeros((wv, tile.shape[-1]), tile.dtype)

    # ky packed into lanes: rows3[q] = (x[q-1], x[q], x[q+1]) along channels
    rows3 = jnp.concatenate(
        [tile[pl.ds(slot, 1), ky:ky + th][0] for ky in range(3)], axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wv, 1), 1)
    acc = jnp.zeros((th, wv, cout), jnp.float32)
    for kx in range(3):
        p = jax.lax.dot_general(
            rows3, w_ref[kx],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + _roll_p(p, kx, wv, col)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv_e2(x, w, th=8):
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    # wk[kx] = concat over ky of w[ky, kx] -> (3, 3C, Cout)
    wk = jnp.stack([jnp.concatenate([w[0, kx], w[1, kx], w[2, kx]], axis=0)
                    for kx in range(3)])
    return pl.pallas_call(
        _kernel_e2,
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((3, 3 * cin, cout), lambda b, i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, th, ww, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, th + 2, ww, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=INTERPRET,
    )(x, wk)


def check(name, fn, x, w, tol=0.15):
    r_ref = np.asarray(jax.jit(conv_xla)(x, w), np.float32)
    r = np.asarray(jax.jit(fn)(x, w), np.float32)
    d = np.abs(r - r_ref).max()
    print(f"{name}: max|diff| {d:.5f} shape {r.shape}", flush=True)
    assert d < tol, (name, d)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "halo"
    x = arr((B, H, W, C))
    w = arr((3, 3, C, C), scale=0.1)

    if int(os.environ.get("SKIP_CHECK", "0")):
        timeit("XLA conv 3x3", conv_xla, x, w)
        for th in (8, 16):
            timeit(f"{which} pallas conv 3x3 TH={th}",
                   functools.partial({"halo": conv_halo, "dma": conv_dma,
                                      "roll": conv_roll, "e": conv_e, "e2": conv_e2,
                                      "prodroll": conv_prodroll}[which],
                                     th=th), x, w)
        return

    if which in ("halo", "all"):
        check("halo", conv_halo, x, w)
    if which in ("roll", "all"):
        check("roll", conv_roll, x, w)
    if which in ("prodroll", "all"):
        check("prodroll", conv_prodroll, x, w)
    if which in ("dma", "all"):
        check("dma", conv_dma, x, w)
    if which in ("e", "all"):
        check("e", conv_e, x, w)
    if which in ("e2", "all"):
        check("e2", conv_e2, x, w)
    if INTERPRET:
        print("interpret-mode correctness OK", flush=True)
        return

    timeit("XLA conv 3x3", conv_xla, x, w)
    if which in ("halo", "all"):
        timeit("halo pallas conv 3x3 TH=8",
               functools.partial(conv_halo, th=8), x, w)
    if which in ("roll", "all"):
        timeit("roll pallas conv 3x3 TH=8",
               functools.partial(conv_roll, th=8), x, w)
    if which in ("prodroll", "all"):
        for th in (8, 16):
            timeit(f"prodroll pallas conv 3x3 TH={th}",
                   functools.partial(conv_prodroll, th=th), x, w)
    if which in ("dma", "all"):
        timeit("dma pallas conv 3x3 TH=8",
               functools.partial(conv_dma, th=8), x, w)


if __name__ == "__main__":
    main()
