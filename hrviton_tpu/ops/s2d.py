"""Space-to-depth (block=2) domain for full-res conv stacks.

TPU vector lanes are 128-wide: an NHWC tensor with C=32 wastes 3/4 of every
VMEM tile and of HBM bandwidth on lane padding. The SPADE generator's
full-res blocks run at C in {7, 32, 80} (models/spade.py up_3/up_4), far off
the 128-lane grain — the measured ~3.5x gap to the traffic roofline
(ROADMAP.md §1).

This module re-expresses those stacks exactly in a space-to-depth domain:
(N, H, W, C) <-> (N, H/2, W/2, 4C) with phase-major channels
[p(0,0)·C, p(0,1)·C, p(1,0)·C, p(1,1)·C]. 80/32/7-channel tensors become
320/128/28-channel — whole tiles. The ops:

  * ``conv3x3_s2d`` — an exact 3x3 stride-1 pad-1 conv: each of the 4 output
    phases is one 2x2-window conv over the 4C input phases with per-phase
    padding (a 16/9 flop inflation — the MXU has ~10x headroom here, traffic
    is the binding constraint).
  * ``conv1x1_s2d`` — per-phase channel matmul (zero flop inflation).
  * ``instance_norm_s2d`` — stats reduce over (space, phase) per original
    channel; bit-comparable f32 math to ops' InstanceNorm2d.
  * ``upsample2x_s2d`` — nearest x2 upsample (the generator's ``up``)
    becomes a pure channel tile: s2d(up(x)) = [x, x, x, x].

Used by the inference SPADE generator for its two full-res blocks; verified
against the reference formulation in tests/test_s2d.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["to_s2d", "from_s2d", "conv3x3_s2d", "conv1x1_s2d",
           "instance_norm_s2d", "upsample2x_s2d", "concat_s2d"]


def to_s2d(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major channel layout."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    y = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h // 2, w // 2, 4 * c)


def from_s2d(y: jax.Array, c: int) -> jax.Array:
    """Inverse of :func:`to_s2d`; ``c`` is the original channel count."""
    n, hh, ww, c4 = y.shape
    assert c4 == 4 * c, (c4, c)
    x = y.reshape(n, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * hh, 2 * ww, c)


def upsample2x_s2d(x: jax.Array) -> jax.Array:
    """s2d of nearest-x2 upsample: every phase equals the source pixel."""
    return jnp.concatenate([x, x, x, x], axis=-1)


def concat_s2d(parts, channels) -> jax.Array:
    """Channel-concat in the s2d domain.

    A plain ``concatenate([a, b], -1)`` of phase-major s2d tensors would put
    all of a's phases before b's; the s2d rep of the full-res concat instead
    interleaves per phase. ``channels`` lists each part's ORIGINAL (plain)
    channel count."""
    n, hh, ww = parts[0].shape[:3]
    split = [p.reshape(n, hh, ww, 4, c) for p, c in zip(parts, channels)]
    return jnp.concatenate(split, axis=-1).reshape(n, hh, ww,
                                                   4 * sum(channels))


@functools.lru_cache(maxsize=None)
def _phase_maps():
    """(a, b) -> list of (U, V, py, px, dy, dx) tap placements."""
    out = {}
    for a in (0, 1):
        for b in (0, 1):
            taps = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    u = (a + dy) // 2 + (1 - a)   # window row in [0, 2)
                    v = (b + dx) // 2 + (1 - b)
                    py, px = (a + dy) % 2, (b + dx) % 2
                    taps.append((u, v, py, px, dy + 1, dx + 1))
            out[(a, b)] = taps
    return out


def _phase_kernel(k: np.ndarray | jax.Array, a: int, b: int):
    """Build the (2, 2, 4*Cin, Cout) kernel for output phase (a, b)."""
    _, _, cin, cout = k.shape
    kk = jnp.zeros((2, 2, 4, cin, cout), k.dtype)
    for (u, v, py, px, ky, kx) in _phase_maps()[(a, b)]:
        kk = kk.at[u, v, py * 2 + px].set(k[ky, kx])
    return kk.reshape(2, 2, 4 * cin, cout)


def conv3x3_s2d(x2: jax.Array, k, b=None, dtype=None) -> jax.Array:
    """Exact 3x3 stride-1 pad-1 conv, computed in the s2d domain.

    Args:
      x2: (N, H', W', 4*Cin) phase-major s2d input.
      k: (3, 3, Cin, Cout) HWIO kernel (any float dtype).
      b: optional (Cout,) bias, added after the output-dtype round (the
        f32-accumulate -> round -> bias chain of nn/layers.py _ConvCore).
      dtype: compute/output dtype (defaults to x2.dtype).

    Returns (N, H', W', 4*Cout) phase-major s2d output.
    """
    dtype = dtype or x2.dtype
    k = k.astype(dtype)
    outs = []
    for a in (0, 1):
        for bb in (0, 1):
            kab = _phase_kernel(k, a, bb)
            dn = lax.conv_dimension_numbers(x2.shape, kab.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x2, kab, (1, 1), ((1 - a, a), (1 - bb, bb)),
                dimension_numbers=dn)
            if b is not None:
                y = y + b.astype(dtype)
            outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def conv1x1_s2d(x2: jax.Array, k, b=None, dtype=None) -> jax.Array:
    """1x1 conv in the s2d domain: one per-phase matmul, no flop inflation.

    k: (1, 1, Cin, Cout) or (Cin, Cout)."""
    dtype = dtype or x2.dtype
    if k.ndim == 4:
        k = k[0, 0]
    k = k.astype(dtype)
    n, hh, ww, c4 = x2.shape
    cin = k.shape[0]
    y = jax.lax.dot_general(
        x2.reshape(n, hh, ww, 4, cin), k,
        dimension_numbers=(((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y.reshape(n, hh, ww, 4 * k.shape[1])


def instance_norm_s2d(x2: jax.Array, c: int, eps: float = 1e-5) -> jax.Array:
    """Instance norm whose stats match the full-res formulation exactly:
    per original channel, reduced over space AND the 4 phases."""
    n, hh, ww, c4 = x2.shape
    assert c4 == 4 * c, (c4, c)
    xf = x2.astype(jnp.float32).reshape(n, hh, ww, 4, c)
    mu = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 3), keepdims=True)
    out = (xf - mu) * lax.rsqrt(var + eps)
    return out.reshape(n, hh, ww, c4).astype(x2.dtype)
