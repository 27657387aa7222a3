"""Total-variation losses on appearance-flow fields.

Parity with /root/reference/train_condition.py:187-232: plain TV over each
flow level (mean of |Δy| + |Δx|), optional last-level-only variant, and the
edge-aware variants that downweight TV across cloth-mask edges with
exp(-150 |Δmask|).

Flows are (N, H, W, 2), channel-last (no permutes needed vs the reference).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from hrviton_tpu.ops.resize import interpolate

__all__ = ["tv_loss", "edge_aware_tv_loss", "flow_tv_suite"]


def tv_loss(flow):
    y_tv = jnp.mean(jnp.abs(flow[:, 1:] - flow[:, :-1]))
    x_tv = jnp.mean(jnp.abs(flow[:, :, 1:] - flow[:, :, :-1]))
    return y_tv + x_tv


def edge_aware_tv_loss(flow, warped_clothmask):
    """Edge-aware TV at one flow level (train_condition.py:201-226).

    warped_clothmask: (N, H, W, 1) at full condition resolution; it is
    downsampled to the flow's resolution bilinearly, then used as the edge map.
    """
    m = interpolate(warped_clothmask, size=flow.shape[1:3], mode="bilinear")
    y_tv = jnp.abs(flow[:, 1:] - flow[:, :-1])
    x_tv = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    mask_y = jnp.exp(-150.0 * jnp.abs(m[:, 1:] - m[:, :-1]))
    mask_x = jnp.exp(-150.0 * jnp.abs(m[:, :, 1:] - m[:, :, :-1]))
    return jnp.mean(y_tv * mask_y) + jnp.mean(x_tv * mask_x)


def flow_tv_suite(flow_list: Sequence, warped_clothmask=None,
                  edgeawaretv: str = "no_edge", lasttvonly: bool = False,
                  add_lasttv: bool = False):
    """Full TV-loss dispatch (train_condition.py:187-232)."""
    loss = 0.0
    if edgeawaretv == "no_edge":
        flows = flow_list[-1:] if lasttvonly else flow_list
        for f in flows:
            loss = loss + tv_loss(f)
    elif edgeawaretv == "last_only":
        loss = loss + edge_aware_tv_loss(flow_list[-1], warped_clothmask)
    elif edgeawaretv == "weighted":
        for i, f in enumerate(flow_list):
            loss = loss + edge_aware_tv_loss(f, warped_clothmask) / (2 ** (4 - i))
    else:
        raise ValueError(edgeawaretv)
    if edgeawaretv != "no_edge" and add_lasttv:
        loss = loss + tv_loss(flow_list[-1])
    return loss
