"""Reference-side torch executor for the end-to-end fidelity gate.

The environment has no ``torch_geometric``/``skimage``, so the reference's
own scripts cannot run verbatim. This module provides behaviorally
equivalent torch models — PyG ``GATConv``/``GCNConv`` math re-derived in
dense-adjacency form (the same math the repo's numpy goldens in
``tests/test_graph_models.py`` encode) — with **state_dict key names
identical to the reference models**, so checkpoints produced here are
drop-in compatible with the reference's loaders
(``/root/reference/models/region_graph/test.py:198``) and with
``camouflage_multimodal_tpu.core.torch_compat``.

Architectures mirrored:
* ``RefRegionGraphGNN`` — /root/reference/models/region_graph/train.py:235-312
  (GAT(4 heads, averaged) → 3× edge-weighted GCN, BN+ReLU+dropout, shared FC,
  mask/instance/edge heads; embedding hooks per extract_rg_embeddings.py:94-135).
* ``RefKnowledgeGraphGNN`` — /root/reference/models/knowledge_graph/train_model.py:28-87.
* The multimodal fusion model is NOT mirrored — the reference's own
  ``fusion_model.py`` is plain torch and is imported directly via
  :func:`load_reference_fusion_module` (with a 3-line ``global_mean_pool``
  stub for its one PyG import).

torch lives only here and in tests — never in ``camouflage_multimodal_tpu/``
(CLAUDE.md rule).
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Dense-adjacency PyG conv math
# ---------------------------------------------------------------------------

class GCNConv(nn.Module):
    """PyG GCNConv on a dense weighted adjacency:
    ``D̂^-1/2 (A+I) D̂^-1/2 X W + b`` (self-loop weight 1, symmetric norm)."""

    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.lin = nn.Linear(in_channels, out_channels, bias=False)
        self.bias = nn.Parameter(torch.zeros(out_channels))
        nn.init.xavier_uniform_(self.lin.weight)

    def forward(self, x: torch.Tensor, adj_w: torch.Tensor) -> torch.Tensor:
        K = x.shape[0]
        a = adj_w + torch.eye(K, dtype=x.dtype, device=x.device)
        deg = a.sum(1)
        dinv = deg.pow(-0.5)
        dinv = torch.where(torch.isfinite(dinv), dinv, torch.zeros_like(dinv))
        a_norm = dinv[:, None] * a * dinv[None, :]
        return a_norm @ self.lin(x) + self.bias


class GATConv(nn.Module):
    """PyG GATConv (heads, concat=False) on a dense boolean adjacency:
    per-head softmax over senders j ∈ N(i) ∪ {i} of
    LeakyReLU(a_dst·Wx_i + a_src·Wx_j, 0.2), head-averaged output."""

    def __init__(self, in_channels: int, out_channels: int, heads: int = 4):
        super().__init__()
        self.heads = heads
        self.out_channels = out_channels
        self.lin = nn.Linear(in_channels, heads * out_channels, bias=False)
        self.att_src = nn.Parameter(torch.empty(1, heads, out_channels))
        self.att_dst = nn.Parameter(torch.empty(1, heads, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels))
        nn.init.xavier_uniform_(self.lin.weight)
        nn.init.xavier_uniform_(self.att_src)
        nn.init.xavier_uniform_(self.att_dst)

    def forward(self, x: torch.Tensor, adj: torch.Tensor) -> torch.Tensor:
        K = x.shape[0]
        h = self.lin(x).view(K, self.heads, self.out_channels)
        alpha_src = (h * self.att_src).sum(-1)  # (K, H) — sender term
        alpha_dst = (h * self.att_dst).sum(-1)  # (K, H) — receiver term
        allow = adj.bool() | torch.eye(K, dtype=torch.bool, device=x.device)
        e = alpha_dst[:, None, :] + alpha_src[None, :, :]  # (i, j, H)
        e = F.leaky_relu(e, 0.2)
        e = e.masked_fill(~allow[:, :, None], float("-inf"))
        att = torch.softmax(e, dim=1)
        out = torch.einsum("ijh,jhd->ihd", att, h)
        return out.mean(1) + self.bias


# ---------------------------------------------------------------------------
# Region-graph GNN (train.py:235-312 architecture, dense-graph forward)
# ---------------------------------------------------------------------------

class RefRegionGraphGNN(nn.Module):
    def __init__(self, in_channels: int = 15, hidden_channels: int = 128,
                 num_classes: int = 2):
        super().__init__()
        self.conv1 = GATConv(in_channels, hidden_channels, heads=4)
        self.bn1 = nn.BatchNorm1d(hidden_channels)
        self.conv2 = GCNConv(hidden_channels, hidden_channels)
        self.bn2 = nn.BatchNorm1d(hidden_channels)
        self.conv3 = GCNConv(hidden_channels, hidden_channels)
        self.bn3 = nn.BatchNorm1d(hidden_channels)
        self.conv4 = GCNConv(hidden_channels, hidden_channels)
        self.bn4 = nn.BatchNorm1d(hidden_channels)
        self.fc_shared = nn.Linear(hidden_channels, hidden_channels)
        self.fc_mask_1 = nn.Linear(hidden_channels, hidden_channels // 2)
        self.fc_mask_2 = nn.Linear(hidden_channels // 2, num_classes)
        self.fc_instance_1 = nn.Linear(hidden_channels, hidden_channels // 2)
        self.fc_instance_2 = nn.Linear(hidden_channels // 2, num_classes)
        self.fc_edge_1 = nn.Linear(hidden_channels, hidden_channels // 2)
        self.fc_edge_2 = nn.Linear(hidden_channels // 2, 1)

    def _backbone(self, x: torch.Tensor, adj: torch.Tensor,
                  edge_weight: torch.Tensor, dropout: bool) -> torch.Tensor:
        """conv1 attends over connectivity only; convs 2-4 use RAG weights
        (reference forward passes edge_weight from conv2 on). ``dropout``
        distinguishes forward (p=0.3 between layers) from the reference's
        dropout-free embedding hook."""
        x = F.relu(self.bn1(self.conv1(x, adj)))
        if dropout:
            x = F.dropout(x, p=0.3, training=self.training)
        x = F.relu(self.bn2(self.conv2(x, edge_weight)))
        if dropout:
            x = F.dropout(x, p=0.3, training=self.training)
        x = F.relu(self.bn3(self.conv3(x, edge_weight)))
        if dropout:
            x = F.dropout(x, p=0.3, training=self.training)
        return F.relu(self.bn4(self.conv4(x, edge_weight)))

    def forward(self, x, adj, edge_weight):
        x = self._backbone(x, adj, edge_weight, dropout=True)
        x_shared = F.relu(self.fc_shared(x))
        x_shared = F.dropout(x_shared, p=0.2, training=self.training)

        def head(fc1, fc2):
            y = F.relu(fc1(x_shared))
            y = F.dropout(y, p=0.2, training=self.training)
            return fc2(y)

        return (head(self.fc_mask_1, self.fc_mask_2),
                head(self.fc_instance_1, self.fc_instance_2),
                head(self.fc_edge_1, self.fc_edge_2))

    def extract_node_embeddings(self, x, adj, edge_weight):
        """Dropout-free hook (extract_rg_embeddings.py:94-121)."""
        h = self._backbone(x, adj, edge_weight, dropout=False)
        return F.relu(self.fc_shared(h))

    def extract_graph_embedding(self, x, adj, edge_weight):
        return self.extract_node_embeddings(x, adj, edge_weight).mean(0, keepdim=True)


# ---------------------------------------------------------------------------
# Knowledge-graph GNN (train_model.py:28-87, dense-graph forward)
# ---------------------------------------------------------------------------

class RefKnowledgeGraphGNN(nn.Module):
    def __init__(self, in_channels: int = 32, hidden_channels: int = 128,
                 embedding_dim: int = 128, out_channels: int = 1):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.conv1 = GCNConv(in_channels, hidden_channels)
        self.bn1 = nn.BatchNorm1d(hidden_channels)
        self.conv2 = GCNConv(hidden_channels, hidden_channels)
        self.bn2 = nn.BatchNorm1d(hidden_channels)
        self.conv3 = GCNConv(hidden_channels, hidden_channels)
        self.bn3 = nn.BatchNorm1d(hidden_channels)
        self.embedding_layer = nn.Sequential(
            nn.Linear(hidden_channels, embedding_dim), nn.ReLU(), nn.Dropout(0.2))
        self.classifier = nn.Sequential(
            nn.Linear(embedding_dim, 64), nn.ReLU(), nn.Dropout(0.2),
            nn.Linear(64, out_channels))

    def forward(self, x, adj_w, return_embedding: bool = False):
        x = F.relu(self.bn1(self.conv1(x, adj_w)))
        x = F.dropout(x, 0.3, training=self.training)
        x = F.relu(self.bn2(self.conv2(x, adj_w)))
        x = F.dropout(x, 0.3, training=self.training)
        x = F.relu(self.bn3(self.conv3(x, adj_w)))
        embedding = self.embedding_layer(x.mean(0, keepdim=True))
        if return_embedding:
            return embedding
        return self.classifier(embedding)

    def get_embedding(self, x, adj_w):
        return self.forward(x, adj_w, return_embedding=True)


# ---------------------------------------------------------------------------
# The reference's own fusion model, imported directly
# ---------------------------------------------------------------------------

def load_reference_fusion_module(
        path: str = "/root/reference/models/multimodal/fusion_model.py"):
    """Import the reference's fusion_model.py verbatim as the torch golden.

    Its single torch_geometric import (``global_mean_pool``, unused by the
    fusion classes themselves) is satisfied with a stub so the plain-torch
    model runs without PyG installed.
    """
    import importlib.util

    if "torch_geometric" not in sys.modules:
        pkg = types.ModuleType("torch_geometric")
        nn_mod = types.ModuleType("torch_geometric.nn")

        def global_mean_pool(x, batch):
            return torch.stack([x[batch == b].mean(0) for b in torch.unique(batch)])

        nn_mod.global_mean_pool = global_mean_pool
        pkg.nn = nn_mod
        sys.modules["torch_geometric"] = pkg
        sys.modules["torch_geometric.nn"] = nn_mod

    spec = importlib.util.spec_from_file_location("reference_fusion_model", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
