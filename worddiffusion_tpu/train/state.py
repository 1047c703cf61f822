"""Train state: params + optimizer + EMA, one pytree.

EMA semantics match the reference (``train.py:140-170``): during the
first ``warmup`` steps the EMA copy is reset to the raw params each
step; afterwards it is ``ema*beta + params*(1-beta)`` — implemented as
a branch-free ``jnp.where`` inside the jitted step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )


def ema_update(
    ema: Any, params: Any, step: jax.Array, beta: float, warmup: int
) -> Any:
    in_warmup = step < warmup

    def leaf(e, p):
        mixed = e * beta + p * (1.0 - beta)
        return jnp.where(in_warmup, p, mixed)

    return jax.tree_util.tree_map(leaf, ema, params)


def make_optimizer(lr: float, weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW lr=1e-4 (reference ``trainModifyCondition.py:1110``)."""
    return optax.adamw(lr, weight_decay=weight_decay)
