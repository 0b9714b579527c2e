"""ReduceLROnPlateau as a pure functional state transition.

optax has no scheduler with torch's ReduceLROnPlateau semantics
(SURVEY.md §7.3), and the reference's accuracy depends on it (stepped on the
*train* loss every epoch: GLASSTest.py:214-216,225). Re-implemented here as a
pure (state, loss) -> state function so it can run either host-side or inside
a jitted epoch loop.

Torch semantics reproduced (mode='min', threshold_mode='rel', cooldown=0):
  is_better  := loss < best * (1 - threshold)         threshold = 1e-4
  on better  : best = loss, num_bad = 0
  on worse   : num_bad += 1
  num_bad > patience (default 10): lr = max(lr * factor, min_lr), num_bad = 0
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PlateauState(NamedTuple):
    lr: jnp.ndarray  # current learning rate (scalar)
    best: jnp.ndarray  # best loss seen
    num_bad: jnp.ndarray  # epochs since last improvement


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, dtype=jnp.float32),
        best=jnp.asarray(jnp.inf, dtype=jnp.float32),
        num_bad=jnp.asarray(0, dtype=jnp.int32),
    )


def plateau_step(
    state: PlateauState,
    loss,
    factor: float,
    min_lr: float = 5e-5,
    patience: int = 10,
    threshold: float = 1e-4,
) -> PlateauState:
    loss = jnp.asarray(loss, dtype=jnp.float32)
    is_better = loss < state.best * (1.0 - threshold)
    best = jnp.where(is_better, loss, state.best)
    num_bad = jnp.where(is_better, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)
