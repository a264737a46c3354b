"""Train state + optimizers with torch-parity semantics."""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_adamw_tx(weight_decay: float, clip_norm: float = 1.0):
    """torch AdamW (decoupled decay) with global-norm grad clipping.

    The learning rate is applied separately in the train step (multiplying
    the produced update by −lr), so per-epoch schedules like cosine warm
    restarts can drive it without rebuilding the optimizer."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
    )


def make_adam_l2_tx(weight_decay: float, clip_norm: float = 1.0):
    """torch Adam with ``weight_decay`` (L2 added to gradients *before* the
    moment estimates — the reference KG trainer used plain Adam,
    train_model.py:376)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
    )


def apply_updates(tx, state: TrainState, grads, lr: jnp.ndarray,
                  new_batch_stats=None) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(
        params=new_params,
        batch_stats=new_batch_stats if new_batch_stats is not None else state.batch_stats,
        opt_state=new_opt_state,
        step=state.step + 1,
    )
