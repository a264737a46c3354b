"""Region-graph GNN over padded superpixel graphs.

Same architecture and multi-task heads as the reference ``RegionGraphGNN``
(single source of truth here — the reference kept three drifting copies at
``region_graph/train.py:235-312``, ``extract_rg_embeddings.py:27-135`` and
``test.py:22-87``): GAT(4 heads, averaged) → 3× edge-weighted GCN, each with
BatchNorm+ReLU+dropout(0.3), a shared FC, and mask / instance / edge heads.

TPU formulation: inputs are fixed-shape padded buckets — node features
(B, K, 15), boolean adjacency (B, K, K), RAG edge weights (B, K, K) and a
node validity mask (B, K) — so the forward is one jittable program that
batches with a real leading axis instead of PyG's block-diagonal sparse
batch, and shards over a mesh along B.

The embedding hooks of the reference (``extract_node_embeddings`` /
``extract_graph_embedding``, extract_rg_embeddings.py:94-135) are the
``node_embeddings`` / ``graph_embedding`` outputs here (the post-fc_shared
ReLU activations and their masked mean pool).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from camouflage_multimodal_tpu.models.layers import MaskedBatchNorm
from camouflage_multimodal_tpu.ops.graph import (
    gat_layer,
    gcn_layer,
    masked_mean_pool,
    normalize_adjacency,
)


class RegionGraphGNN(nn.Module):
    in_channels: int = 15
    hidden_channels: int = 128
    num_classes: int = 2
    gat_heads: int = 4
    dropout: float = 0.3
    head_dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, adjacency: jnp.ndarray,
                 edge_weights: jnp.ndarray, node_mask: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Args:
          x: (B, K, in_channels) node features
          adjacency: (B, K, K) bool
          edge_weights: (B, K, K) float RAG weights (0 off-graph)
          node_mask: (B, K) bool
        Returns dict: mask_logits (B,K,2), instance_logits (B,K,2),
          edge_logits (B,K,1), node_embeddings (B,K,H), graph_embedding (B,H).
        """
        H = self.hidden_channels
        deterministic = not train

        # Layer 1: GAT without edge weights (reference conv1(x, edge_index)).
        k1 = self.param("gat_kernel", nn.initializers.glorot_uniform(),
                        (self.in_channels, self.gat_heads, H))
        a_src = self.param("gat_att_src", nn.initializers.glorot_uniform(), (self.gat_heads, H))
        a_dst = self.param("gat_att_dst", nn.initializers.glorot_uniform(), (self.gat_heads, H))
        b1 = self.param("gat_bias", nn.initializers.zeros, (H,))
        h = gat_layer(x, adjacency, node_mask, k1, a_src, a_dst, b1)
        h = MaskedBatchNorm(H, name="bn1")(h, node_mask, deterministic)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        # Layers 2-4: GCN with RAG edge weights (shared normalized adjacency).
        adj_norm = normalize_adjacency(edge_weights, node_mask)
        for i in (2, 3, 4):
            k = self.param(f"gcn{i}_kernel", nn.initializers.glorot_uniform(), (H, H))
            b = self.param(f"gcn{i}_bias", nn.initializers.zeros, (H,))
            h = gcn_layer(h, adj_norm, k, b)
            h = MaskedBatchNorm(H, name=f"bn{i}")(h, node_mask, deterministic)
            h = nn.relu(h)
            if i < 4:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        # Shared representation — this is the 128-d embedding hook.
        node_embeddings = nn.relu(nn.Dense(H, name="fc_shared")(h))
        node_embeddings = jnp.where(node_mask[..., None], node_embeddings, 0.0)
        shared = nn.Dropout(self.head_dropout)(node_embeddings, deterministic=deterministic)

        def head(name: str, out_dim: int) -> jnp.ndarray:
            y = nn.relu(nn.Dense(H // 2, name=f"fc_{name}_1")(shared))
            y = nn.Dropout(self.head_dropout)(y, deterministic=deterministic)
            return nn.Dense(out_dim, name=f"fc_{name}_2")(y)

        return {
            "mask_logits": head("mask", self.num_classes),
            "instance_logits": head("instance", self.num_classes),
            "edge_logits": head("edge", 1),
            "node_embeddings": node_embeddings,
            "graph_embedding": masked_mean_pool(node_embeddings, node_mask),
        }
