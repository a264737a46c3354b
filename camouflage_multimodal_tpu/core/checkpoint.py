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
