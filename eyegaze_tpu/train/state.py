"""Train state: params + optimizer state + step, as a flax struct pytree."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Minimal TrainState (flax.training.train_state parity) with RNG folding."""

    step: int
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def create_train_state(model, variables, tx) -> TrainState:
    params = variables["params"] if "params" in variables else variables
    return TrainState(
        step=0,
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
