"""Train-state containers (pytree dataclasses) for the two GAN stages."""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import struct

__all__ = ["NetState", "GANState"]


class NetState(struct.PyTreeNode):
    """One network's trainables + mutable collections + optimizer state."""
    params: Any
    extras: Dict[str, Any]     # e.g. {'batch_stats': ..., 'aux': ...}
    opt_state: Any

    def variables(self):
        return {"params": self.params, **self.extras}


class GANState(struct.PyTreeNode):
    step: jax.Array
    g: NetState
    d: NetState
