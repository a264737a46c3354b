"""Checkpointing.

Keeps the reference's best-metric checkpoint policy and metadata schemas
(RG: best val loss — ``region_graph/train.py:381-384``; KG: best val loss
with ``embedding_dim`` — ``train_model.py:420-427``; multimodal: best
F1-class-1 carrying config + optimizer state + metrics —
``train_multimodal.py:464-474``) while storing JAX pytrees instead of torch
state dicts.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), jax.device_get(tree))


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(payload), f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Mid-training resume (SURVEY §5: the reference had none — its trainers
# restart from scratch; this is the orbax-style full-train-state resume,
# kept in the same pickle format as the best-metric checkpoints).
# ---------------------------------------------------------------------------

def save_resume_checkpoint(path: str, state: Any, *, epoch: int,
                           numpy_rng: np.random.Generator,
                           dropout_key: Any, history: Dict[str, Any],
                           best_val: float,
                           extra: Dict[str, Any] | None = None) -> None:
    """Snapshot EVERYTHING a trainer needs to continue bit-exactly:
    params + batch_stats + opt_state + step, the epoch counter, the host
    numpy shuffle RNG state, the device dropout key, the running history and
    the best-val watermark."""
    payload = {
        "train_state": {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        },
        "epoch": int(epoch),
        "numpy_rng_state": numpy_rng.bit_generator.state,
        "dropout_key": dropout_key,
        "history": history,
        "best_val": float(best_val),
    }
    if extra:
        payload.update(extra)
    save_checkpoint(path, payload)


def load_resume_checkpoint(path: str) -> Dict[str, Any]:
    """Inverse of :func:`save_resume_checkpoint`. The caller rebuilds its
    TrainState from ``blob['train_state']`` and MUST restore
    ``numpy_rng.bit_generator.state`` before the first post-resume shuffle."""
    return load_checkpoint(path)
