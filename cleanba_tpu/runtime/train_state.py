"""Minimal TrainState (replaces flax.training.train_state.TrainState, which in
current flax assumes params is a Mapping — our params are the AgentParams
struct, reference cleanba_ppo.py:206-210)."""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax.numpy as jnp
import optax

__all__ = ["TrainState"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, tx: optax.GradientTransformation, apply_fn: Callable = None):
        del apply_fn
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, *, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)
