"""Train state pytree: step counter, trainable params, optimizer state.

Frozen params are carried separately (they never change and are not part of
the differentiated state); keeping them out of TrainState means checkpoints
of training progress are O(APLA-rank), with the frozen backbone saved once.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray          # int32 scalar
    trainable: Any             # pytree of trainable params
    opt_state: Any             # optax state (incl. injected lr hyperparam)

    @classmethod
    def create(cls, trainable, tx):
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable,
                   opt_state=tx.init(trainable))
