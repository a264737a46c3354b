"""Knowledge-graph GNN over padded semantic subgraphs.

Same architecture as the reference ``KnowledgeGraphGNN``
(``/root/reference/models/knowledge_graph/train_model.py:28-87``): 3× GCN
(32→128) each with BatchNorm+ReLU (+dropout 0.3 after the first two),
global mean pool, an embedding layer Linear+ReLU+Dropout(0.2) whose output
is the 128-d fusion embedding (``get_embedding``), and a regression
classifier MLP 128→64→1 on the camouflage score.

Inputs are padded buckets (B, N, 32) + bool adjacency + node mask produced
by :mod:`camouflage_multimodal_tpu.kg.featurize`.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from camouflage_multimodal_tpu.models.layers import MaskedBatchNorm
from camouflage_multimodal_tpu.ops.graph import (
    gcn_layer,
    masked_mean_pool,
    normalize_adjacency,
)


class KnowledgeGraphGNN(nn.Module):
    in_channels: int = 32
    hidden_channels: int = 128
    embedding_dim: int = 128
    out_channels: int = 1
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, adjacency: jnp.ndarray,
                 node_mask: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """x: (B, N, 32), adjacency: (B, N, N) bool, node_mask: (B, N)."""
        H = self.hidden_channels
        deterministic = not train
        adj_norm = normalize_adjacency(adjacency.astype(jnp.float32), node_mask)

        h = x
        for i in (1, 2, 3):
            cin = self.in_channels if i == 1 else H
            k = self.param(f"gcn{i}_kernel", nn.initializers.glorot_uniform(), (cin, H))
            b = self.param(f"gcn{i}_bias", nn.initializers.zeros, (H,))
            h = gcn_layer(h, adj_norm, k, b)
            h = MaskedBatchNorm(H, name=f"bn{i}")(h, node_mask, deterministic)
            h = nn.relu(h)
            if i < 3:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        pooled = masked_mean_pool(h, node_mask)
        emb = nn.relu(nn.Dense(self.embedding_dim, name="embedding")(pooled))
        emb = nn.Dropout(0.2)(emb, deterministic=deterministic)

        y = nn.relu(nn.Dense(64, name="classifier_1")(emb))
        y = nn.Dropout(0.2)(y, deterministic=deterministic)
        score = nn.Dense(self.out_channels, name="classifier_2")(y)

        return {"score": score, "embedding": emb}
