#!/usr/bin/env python
"""Experiment 3: block-level A/B of fused SPADEResBlock structures (raw lax).

All variants compute the SAME math as SPADEResBlock(80->32, spectral alias
instance) in eval mode; only operator structure differs. Checks max|diff| vs v0
on a small shape, then times the 1024x768 shape.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import jax.lax as lax

B = 4
K = int(os.environ.get("PROF_ITERS", "10"))
H, W = 1024, 768
CIN, CMID, COUT = 80, 32, 32
NH = 128  # nhidden
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

def conv(x, w, b=None, pad=0):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w, (1, 1), ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn)
    return y if b is None else y + b

def inorm(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + eps)).astype(x.dtype)

def lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)

# ---- params (shared by all variants) --------------------------------------
def make_params(cin, cmid, cout):
    p = {}
    for name, c in (("s", cin), ("0", cin), ("1", cmid)):
        p[f"ws_{name}"] = arr((3, 3, 7, NH), scale=0.1)
        p[f"bs_{name}"] = arr((NH,), scale=0.1)
        p[f"wg_{name}"] = arr((3, 3, NH, c), scale=0.1)
        p[f"bg_{name}"] = arr((c,), scale=0.1)
        p[f"wb_{name}"] = arr((3, 3, NH, c), scale=0.1)
        p[f"bb_{name}"] = arr((c,), scale=0.1)
        p[f"nscale_{name}"] = arr((c,), jnp.float32, scale=0.02)
    p["w_convs"] = arr((1, 1, cin, cout), scale=0.1)
    p["w_conv0"] = arr((3, 3, cin, cmid), scale=0.1)
    p["b_conv0"] = arr((cmid,), scale=0.1)
    p["w_conv1"] = arr((3, 3, cmid, cout), scale=0.1)
    p["b_conv1"] = arr((cout,), scale=0.1)
    return p

NKEY = jax.random.PRNGKey(7)

def noise3(b, h, w):
    return jax.random.normal(NKEY, (b, h, w, 3), jnp.float32)

# ---- v0: current structure (separate convs per norm, separate noise) ------
def spade_norm_v0(p, tag, x, seg, noise1):
    xn = (x.astype(jnp.float32) + noise1 * p[f"nscale_{tag}"]).astype(x.dtype)
    normalized = inorm(xn)
    actv = jax.nn.relu(conv(seg, p[f"ws_{tag}"], p[f"bs_{tag}"], 1))
    gamma = conv(actv, p[f"wg_{tag}"], p[f"bg_{tag}"], 1)
    beta = conv(actv, p[f"wb_{tag}"], p[f"bb_{tag}"], 1)
    return normalized * (1.0 + gamma) + beta

def block_v0(p, x, seg):
    n = noise3(*x.shape[:3])
    xs = spade_norm_v0(p, "s", x, seg, n[..., 0:1])
    xs = conv(xs, p["w_convs"])
    dx = spade_norm_v0(p, "0", x, seg, n[..., 1:2])
    dx = conv(lrelu(dx), p["w_conv0"], p["b_conv0"], 1)
    dx = spade_norm_v0(p, "1", dx, seg, n[..., 2:3])
    dx = conv(lrelu(dx), p["w_conv1"], p["b_conv1"], 1)
    return xs + dx

# ---- vA: merged gamma+beta per norm, pad to 128 split ----------------------
def pad_out(w, b, cpad):
    c = w.shape[-1]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
    bp = jnp.pad(b, ((0, cpad - c),))
    return wp, bp

def spade_norm_vA(p, tag, x, seg, noise1, actv=None):
    c = p[f"wg_{tag}"].shape[-1]
    cpad = 128 if c <= 128 else ((c + 127) // 128) * 128
    xn = (x.astype(jnp.float32) + noise1 * p[f"nscale_{tag}"]).astype(x.dtype)
    normalized = inorm(xn)
    if actv is None:
        actv = jax.nn.relu(conv(seg, p[f"ws_{tag}"], p[f"bs_{tag}"], 1))
    wg, bg = pad_out(p[f"wg_{tag}"], p[f"bg_{tag}"], cpad)
    wb, bb = pad_out(p[f"wb_{tag}"], p[f"bb_{tag}"], cpad)
    wm = jnp.concatenate([wg, wb], axis=-1)
    bm = jnp.concatenate([bg, bb], axis=-1)
    gb = conv(actv, wm, bm, 1)
    gamma = gb[..., :c]
    beta = gb[..., cpad:cpad + c]
    return normalized * (1.0 + gamma) + beta

def block_vA(p, x, seg):
    n = noise3(*x.shape[:3])
    xs = spade_norm_vA(p, "s", x, seg, n[..., 0:1])
    xs = conv(xs, p["w_convs"])
    dx = spade_norm_vA(p, "0", x, seg, n[..., 1:2])
    dx = conv(lrelu(dx), p["w_conv0"], p["b_conv0"], 1)
    dx = spade_norm_vA(p, "1", dx, seg, n[..., 2:3])
    dx = conv(lrelu(dx), p["w_conv1"], p["b_conv1"], 1)
    return xs + dx

# ---- vB: vA + one merged shared conv (7->384) ------------------------------
def block_vB(p, x, seg):
    n = noise3(*x.shape[:3])
    wsh = jnp.concatenate([p["ws_s"], p["ws_0"], p["ws_1"]], axis=-1)
    bsh = jnp.concatenate([p["bs_s"], p["bs_0"], p["bs_1"]], axis=-1)
    actv = jax.nn.relu(conv(seg, wsh, bsh, 1))
    a_s, a_0, a_1 = actv[..., :NH], actv[..., NH:2*NH], actv[..., 2*NH:]
    xs = spade_norm_vA(p, "s", x, seg, n[..., 0:1], a_s)
    xs = conv(xs, p["w_convs"])
    dx = spade_norm_vA(p, "0", x, seg, n[..., 1:2], a_0)
    dx = conv(lrelu(dx), p["w_conv0"], p["b_conv0"], 1)
    dx = spade_norm_vA(p, "1", dx, seg, n[..., 2:3], a_1)
    dx = conv(lrelu(dx), p["w_conv1"], p["b_conv1"], 1)
    return xs + dx

def main():
    # correctness on small shape
    ps = make_params(CIN, CMID, COUT)
    xs_small = arr((2, 64, 48, CIN))
    seg_small = arr((2, 64, 48, 7))
    r0 = np.asarray(jax.jit(block_v0)(ps, xs_small, seg_small), np.float32)
    for nm, f in (("vA", block_vA), ("vB", block_vB)):
        r = np.asarray(jax.jit(f)(ps, xs_small, seg_small), np.float32)
        print(f"{nm} max|diff| vs v0: {np.abs(r - r0).max():.6f}")

    x = arr((B, H, W, CIN)); seg = arr((B, H, W, 7))
    timeit("block v0 (current structure)", lambda a, b: block_v0(ps, a, b), x, seg)
    timeit("block vA (merged gamma+beta pad128)", lambda a, b: block_vA(ps, a, b), x, seg)
    timeit("block vB (vA + merged shared conv)", lambda a, b: block_vB(ps, a, b), x, seg)

if __name__ == "__main__":
    main()
