"""Train state pytree: params + optimizer state + step.

Strictly more than the reference's checkpointing, which saves only
model weights and has no true resume (reference:
src/theia/scripts/train/train_rvfm.py:153-156; SURVEY.md §5) — orbax
checkpoints of this state restore optimizer moments and step too.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
