"""Embedding-store artifacts.

The reference persists its offline embedding factories as ``torch.save``
dicts (``all_rg_embeddings.pt`` — extract_rg_embeddings.py:375-383,432-433;
``all_embeddings.pt`` — extract_kg_embeddings.py:101-102).  Here the same
logical schemas are portable ``.npz`` archives (no torch dependency on the
TPU path), with loaders that also accept the reference's ``.pt`` files when
torch is importable so existing artifacts migrate transparently.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

_NODE_SUFFIX = "|node_embeddings"
_GRAPH_SUFFIX = "|graph_embedding"


def save_rg_embeddings(path: str, store: Dict[str, Dict[str, np.ndarray]]) -> None:
    """store: image_name → {node_embeddings (N,128), graph_embedding (1,128)}."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for name, rec in store.items():
        arrays[name + _NODE_SUFFIX] = np.asarray(rec["node_embeddings"], np.float32)
        arrays[name + _GRAPH_SUFFIX] = np.asarray(rec["graph_embedding"], np.float32)
    np.savez_compressed(path, **arrays)


def load_rg_embeddings(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    if path.endswith(".pt"):  # reference-format migration path
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {
            name: {
                "node_embeddings": np.asarray(rec["node_embeddings"], np.float32),
                "graph_embedding": np.asarray(rec["graph_embedding"], np.float32),
                "num_nodes": int(rec.get("num_nodes", len(rec["node_embeddings"]))),
            }
            for name, rec in raw.items()
        }
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with np.load(path) as z:
        for key in z.files:
            if key.endswith(_NODE_SUFFIX):
                name = key[: -len(_NODE_SUFFIX)]
                out.setdefault(name, {})["node_embeddings"] = z[key]
            elif key.endswith(_GRAPH_SUFFIX):
                name = key[: -len(_GRAPH_SUFFIX)]
                out.setdefault(name, {})["graph_embedding"] = z[key]
    for rec in out.values():
        rec["num_nodes"] = int(rec["node_embeddings"].shape[0])
    return out


def save_kg_embeddings(path: str, store: Dict[str, np.ndarray]) -> None:
    """store: category → (1, 128) embedding."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v, np.float32) for k, v in store.items()})


def load_kg_embeddings(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pt"):  # reference-format migration path
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {k: np.asarray(v, np.float32).reshape(1, -1) for k, v in raw.items()}
    with np.load(path) as z:
        return {k: z[k].reshape(1, -1) for k in z.files}
