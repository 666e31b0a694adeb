"""Train state: params + batch stats + optimizer state as one pytree.

The three-part structure mirrors the reference checkpoints (model/optimizer/
scheduler state, train_extractor.py:343-359); the schedule is a pure
function of `step`, so no separate scheduler state is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
        )


def create_train_state(model, variables: Dict[str, Any],
                       tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
