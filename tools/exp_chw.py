#!/usr/bin/env python
"""Channel-major (NCHW) reformulation of the full-res SPADE tail convs.

Round-4 hypothesis (follows the exp_up4.py attribution: 86.5 ms up_4 = ~50 ms
modulation chain + ~29 ms main convs + ~7.5 ms noise/instnorm): the tail's
channel counts (80/32/16/64/128) are LANE-hostile in NHWC — a conv lowered as
(N*H*W, 9*Cin) x (9*Cin, Cout) pads Cout 32->128 (4x MXU waste) / 80->128
(1.6x) in the output lane dim. In a channel-major layout the same conv is a
tap-wise matmul  out[o, hw] += k[ky,kx][c,o] . x_shift[c, hw]  whose MXU tile
dims are K=C (sublane, 8-granular: 80/32 are exact), N=H*W (lane, clean
multiples of 128) and M=Cout (streamed, any size) — near-zero padding waste
for every tail conv, expressible in pure XLA (dot_general + shifts), no
Pallas needed.

This tool A/Bs the formulations at up_4's shapes on the real chip:
  * gamma/beta modulation conv pair (NH=128 -> C=80), merged and separate;
  * the main convs (80->32, 32->32);
  * the whole up_4 block (exact math) NHWC vs NCHW, incl. layout transposes.

Usage:
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python tools/exp_chw.py
  python tools/exp_chw.py --check     # CPU numerical equivalence
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHECK = "--check" in sys.argv
if _CHECK:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(os.environ.get("EXP_BATCH", "4"))
K = int(os.environ.get("EXP_ITERS", "10"))
H = int(os.environ.get("EXP_H", "1024"))
W = int(os.environ.get("EXP_W", "768"))
CIN, CMID, COUT, NH, SEG = 80, 32, 32, 128, 7
DTYPE = jnp.float32 if _CHECK else jnp.bfloat16
_rng = np.random.default_rng(0)
_EPS = 1e-5


def arr(*shape, dtype=DTYPE):
    return jnp.asarray(_rng.standard_normal(shape), dtype=dtype)


def timeit(name, fn, *args):
    salts = jnp.arange(K, dtype=jnp.float32) * 1e-6

    @jax.jit
    def many(*a):
        def one(s):
            out = fn(*[x + s.astype(x.dtype) if hasattr(x, "dtype") and
                       jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
                       else x for x in a])
            return jnp.mean(out.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, salts))

    try:
        float(many(*args))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(many(*args))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # OOM on one variant must not kill the sweep
        print(f"{name:56s}    FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return float("inf")
    print(f"{name:56s} {best / K * 1e3:9.2f} ms/batch", flush=True)
    return best / K


# ------------------------------------------------------------ NHWC pieces --
def conv_nhwc(x, k, b=None, pad=1):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, k.astype(x.dtype), (1, 1),
                                 ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn)
    return y if b is None else y + b.astype(y.dtype)


def inorm_nhwc(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + _EPS)).astype(x.dtype)


# ------------------------------------------------------------ NCHW pieces --
def conv3x3_chw(x, k, b=None, pre_act=None, roll_out=True):
    """3x3/s1/p1 conv in channel-major layout as 9 tap matmuls.

    x: (N, C, H, W); k: (3, 3, Cin, Cout) HWIO. H-shifts are slices of an
    H-padded copy (W stays minor: free address offsets); W-shifts are applied
    to the f32 tap *products* as roll+mask (roll_out=True) or to the input
    slices (roll_out=False). f32 accumulation, one round to x.dtype, bias in
    x.dtype — the MXU conv dtype contract (nn/layers.py _ConvCore).
    """
    n, c, h, w = x.shape
    cout = k.shape[-1]
    if pre_act == "relu":
        x = jax.nn.relu(x)
    elif pre_act == "leaky0.2":
        x = jax.nn.leaky_relu(x, 0.2)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    col = jnp.arange(w)[None, None, None, :]
    acc = jnp.zeros((n, cout, h, w), jnp.float32)
    for ky in range(3):
        xs = lax.slice(xp, (0, 0, ky, 0), (n, c, ky + h, w))
        if roll_out:
            for kx in range(3):
                p = jnp.einsum("co,nchw->nohw", k[ky, kx].astype(x.dtype), xs,
                               preferred_element_type=jnp.float32)
                if kx == 1:
                    acc = acc + p
                elif kx == 0:
                    # out[w] += p[w - 1]
                    acc = acc + jnp.where(col == 0, 0.0,
                                          jnp.roll(p, 1, axis=3))
                else:
                    acc = acc + jnp.where(col == w - 1, 0.0,
                                          jnp.roll(p, -1, axis=3))
        else:
            xw = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (1, 1)))
            for kx in range(3):
                xss = lax.slice(xw, (0, 0, 0, kx), (n, c, h, kx + w))
                acc = acc + jnp.einsum("co,nchw->nohw",
                                       k[ky, kx].astype(x.dtype), xss,
                                       preferred_element_type=jnp.float32)
    y = acc.astype(x.dtype)
    return y if b is None else y + b.astype(y.dtype)[None, :, None, None]


def conv1x1_chw(x, k, b=None):
    y = jnp.einsum("co,nchw->nohw", k[0, 0].astype(x.dtype), x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y if b is None else y + b.astype(y.dtype)[None, :, None, None]


def inorm_chw(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(2, 3), keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + _EPS)).astype(x.dtype)


# ------------------------------------------------------------ weights ------
def make_weights():
    w = {}
    for name, ci, co in [
            ("s_sh", SEG, NH), ("s_g", NH, CIN), ("s_b", NH, CIN),
            ("n0_sh", SEG, NH), ("n0_g", NH, CIN), ("n0_b", NH, CIN),
            ("n1_sh", SEG, NH), ("n1_g", NH, CMID), ("n1_b", NH, CMID)]:
        w[name] = (arr(3, 3, ci, co, dtype=jnp.float32) * 0.05,
                   arr(co, dtype=jnp.float32) * 0.05)
    w["conv_s"] = (arr(1, 1, CIN, COUT, dtype=jnp.float32) * 0.05, None)
    w["conv_0"] = (arr(3, 3, CIN, CMID, dtype=jnp.float32) * 0.05,
                   arr(CMID, dtype=jnp.float32) * 0.05)
    w["conv_1"] = (arr(3, 3, CMID, COUT, dtype=jnp.float32) * 0.05,
                   arr(COUT, dtype=jnp.float32) * 0.05)
    for name, c in [("ns_s", CIN), ("ns_0", CIN), ("ns_1", CMID)]:
        w[name] = arr(c, dtype=jnp.float32) * 0.1
    return w


# ------------------------------------------------------- SPADE norm chains --
def spade_norm_nhwc(x, seg_actv, noise, nscale, wg, wbt):
    """noise-add + instance-norm + gamma/beta convs + modulate (NHWC)."""
    xn = x + (noise * nscale).astype(x.dtype)
    normalized = inorm_nhwc(xn)
    a = jax.nn.relu(seg_actv)
    gamma = conv_nhwc(a, wg[0], wg[1])
    beta = conv_nhwc(a, wbt[0], wbt[1])
    return normalized * (1.0 + gamma) + beta


def spade_norm_chw(x, seg_actv, noise, nscale, wg, wbt, roll_out=True):
    xn = x + (noise * nscale[None, :, None, None]).astype(x.dtype)
    normalized = inorm_chw(xn)
    a = jax.nn.relu(seg_actv)
    gamma = conv3x3_chw(a, wg[0], wg[1], roll_out=roll_out)
    beta = conv3x3_chw(a, wbt[0], wbt[1], roll_out=roll_out)
    return normalized * (1.0 + gamma) + beta


def spade_norm_chw_merged(x, seg_actv, noise, nscale, wg, wbt, roll_out=True):
    """gamma|beta as ONE tap matmul (Cout=2C): reads relu(actv) once."""
    c = x.shape[1]
    kgb = jnp.concatenate([wg[0], wbt[0]], axis=-1)
    bgb = jnp.concatenate([wg[1], wbt[1]])
    xn = x + (noise * nscale[None, :, None, None]).astype(x.dtype)
    normalized = inorm_chw(xn)
    gb = conv3x3_chw(jax.nn.relu(seg_actv), kgb, bgb, roll_out=roll_out)
    return normalized * (1.0 + gb[:, :c]) + gb[:, c:]


# ------------------------------------------------------------- full block --
def block_nhwc(x, seg, n_s, n_0, n_1, w):
    def norm(x_, tag, noise, nscale):
        actv = conv_nhwc(seg, w[f"{tag}_sh"][0], w[f"{tag}_sh"][1])
        return spade_norm_nhwc(x_, actv, noise, nscale,
                               w[f"{tag}_g"], w[f"{tag}_b"])

    xs = norm(x, "s", n_s, w["ns_s"])
    xs = conv_nhwc(xs, w["conv_s"][0], pad=0)
    dx = norm(x, "n0", n_0, w["ns_0"])
    dx = conv_nhwc(jax.nn.leaky_relu(dx, 0.2), w["conv_0"][0], w["conv_0"][1])
    dx = norm(dx, "n1", n_1, w["ns_1"])
    dx = conv_nhwc(jax.nn.leaky_relu(dx, 0.2), w["conv_1"][0], w["conv_1"][1])
    return xs + dx


def block_chw(x, seg, n_s, n_0, n_1, w, merged=True, roll_out=True):
    """Exact same math, channel-major; takes/returns NCHW tensors.
    conv_shared stays a real XLA conv in NHWC (7->128 is MXU-friendly and
    seg is tiny); its output transposes to NCHW."""
    sn = spade_norm_chw_merged if merged else spade_norm_chw

    def norm(x_, tag, noise, nscale):
        actv = conv_nhwc(seg, w[f"{tag}_sh"][0], w[f"{tag}_sh"][1])
        actv = jnp.transpose(actv, (0, 3, 1, 2))
        return sn(x_, actv, noise, nscale, w[f"{tag}_g"], w[f"{tag}_b"],
                  roll_out=roll_out)

    xs = norm(x, "s", n_s, w["ns_s"])
    xs = conv1x1_chw(xs, w["conv_s"][0])
    dx = norm(x, "n0", n_0, w["ns_0"])
    dx = conv3x3_chw(dx, w["conv_0"][0], w["conv_0"][1], pre_act="leaky0.2",
                     roll_out=roll_out)
    dx = sn(dx, jnp.transpose(conv_nhwc(
        seg, w["n1_sh"][0], w["n1_sh"][1]), (0, 3, 1, 2)), n_1, w["ns_1"],
        w["n1_g"], w["n1_b"], roll_out=roll_out)
    dx = conv3x3_chw(dx, w["conv_1"][0], w["conv_1"][1], pre_act="leaky0.2",
                     roll_out=roll_out)
    return xs + dx


def check():
    global B, H, W
    B, H, W = 2, 64, 48
    w = make_weights()
    x = arr(B, H, W, CIN)
    seg = arr(B, H, W, SEG)
    n_s, n_0, n_1 = (arr(B, H, W, 1, dtype=jnp.float32) for _ in range(3))
    ref = block_nhwc(x, seg, n_s, n_0, n_1, w)
    for merged in (False, True):
        for roll_out in (False, True):
            got = block_chw(jnp.transpose(x, (0, 3, 1, 2)), seg,
                            jnp.transpose(n_s, (0, 3, 1, 2)),
                            jnp.transpose(n_0, (0, 3, 1, 2)),
                            jnp.transpose(n_1, (0, 3, 1, 2)), w,
                            merged=merged, roll_out=roll_out)
            got = jnp.transpose(got, (0, 2, 3, 1))
            err = float(jnp.max(jnp.abs(ref - got)))
            scale = float(jnp.max(jnp.abs(ref)))
            print(f"merged={merged} roll_out={roll_out}: "
                  f"max |ref - chw| = {err:.3e} (max|ref|={scale:.3e})")
            assert err < 2e-4 * max(scale, 1.0)
    print("check ok")


def main():
    w = make_weights()
    x = arr(B, H, W, CIN)
    seg = arr(B, H, W, SEG)
    n_s, n_0, n_1 = (arr(B, H, W, 1, dtype=jnp.float32) for _ in range(3))
    xc = jnp.transpose(x, (0, 3, 1, 2))
    segc_actv = arr(B, NH, H, W)         # stand-in conv_shared output (NCHW)
    seg_actv = arr(B, H, W, NH)
    nc_s, nc_0, nc_1 = (jnp.transpose(n, (0, 3, 1, 2))
                        for n in (n_s, n_0, n_1))

    # --- isolated modulation-conv pair (the 50 ms of the 86.5) -------------
    timeit("gamma+beta NHWC convs (baseline)",
           lambda a: conv_nhwc(jax.nn.relu(a), w["s_g"][0], w["s_g"][1])
           + conv_nhwc(jax.nn.relu(a), w["s_b"][0], w["s_b"][1]),
           seg_actv)
    timeit("gamma+beta CHW tap-matmul (roll products)",
           lambda a: conv3x3_chw(a, w["s_g"][0], w["s_g"][1], pre_act="relu")
           + conv3x3_chw(a, w["s_b"][0], w["s_b"][1], pre_act="relu"),
           segc_actv)
    kgb = jnp.concatenate([w["s_g"][0], w["s_b"][0]], axis=-1)
    bgb = jnp.concatenate([w["s_g"][1], w["s_b"][1]])
    timeit("gamma|beta CHW merged tap-matmul (roll products)",
           lambda a: conv3x3_chw(a, kgb, bgb, pre_act="relu"), segc_actv)
    timeit("gamma|beta CHW merged tap-matmul (slice inputs)",
           lambda a: conv3x3_chw(a, kgb, bgb, pre_act="relu",
                                 roll_out=False), segc_actv)

    # --- main convs ---------------------------------------------------------
    timeit("conv_0 80->32 NHWC (baseline)",
           lambda a: conv_nhwc(jax.nn.leaky_relu(a, 0.2), w["conv_0"][0],
                               w["conv_0"][1]), x)
    timeit("conv_0 80->32 CHW tap-matmul",
           lambda a: conv3x3_chw(a, w["conv_0"][0], w["conv_0"][1],
                                 pre_act="leaky0.2"), xc)

    # --- one full SPADE-norm chain ------------------------------------------
    timeit("SPADE norm chain NHWC (baseline)",
           lambda a, b: spade_norm_nhwc(a, b, n_s, w["ns_s"], w["s_g"],
                                        w["s_b"]), x, seg_actv)
    timeit("SPADE norm chain CHW merged",
           lambda a, b: spade_norm_chw_merged(a, b, nc_s, w["ns_s"],
                                              w["s_g"], w["s_b"]),
           xc, segc_actv)

    # --- whole up_4 block ----------------------------------------------------
    t_ref = timeit("up_4 block NHWC (baseline)",
                   lambda *a: block_nhwc(*a, w), x, seg, n_s, n_0, n_1)
    t_chw = timeit("up_4 block CHW merged (NCHW in/out)",
                   lambda a, b, c, d, e: block_chw(a, b, c, d, e, w),
                   xc, seg, nc_s, nc_0, nc_1)
    timeit("up_4 block CHW merged (slice inputs)",
           lambda a, b, c, d, e: block_chw(a, b, c, d, e, w, roll_out=False),
           xc, seg, nc_s, nc_0, nc_1)
    timeit("up_4 block CHW merged incl. NHWC<->NCHW transposes",
           lambda a, b, c, d, e: jnp.transpose(block_chw(
               jnp.transpose(a, (0, 3, 1, 2)), b,
               jnp.transpose(c, (0, 3, 1, 2)),
               jnp.transpose(d, (0, 3, 1, 2)),
               jnp.transpose(e, (0, 3, 1, 2)), w), (0, 2, 3, 1)),
           x, seg, n_s, n_0, n_1)
    print(f"CHW speedup (block, ex-transposes): {t_ref / t_chw:.2f}x")


if __name__ == "__main__":
    check() if _CHECK else main()
