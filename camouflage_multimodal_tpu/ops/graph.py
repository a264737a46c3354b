"""Dense, masked graph-neural-network primitives.

TPU-native replacement for torch-geometric's sparse CUDA kernels
(``GCNConv``, ``GATConv``, ``global_mean_pool`` — used by all three GNNs in
the reference, SURVEY.md §2.2).  Variable-size graphs become fixed-size
padded buckets: node features (B, K, C) with a validity mask (B, K) and a
dense adjacency (B, K, K).  At K ≤ 512 dense adjacency matmuls are small MXU
work and every op is fixed-shape, so the whole GNN jits, vmaps and shards
over a device mesh — replacing the reference's block-diagonal sparse batching
(`Batch.from_data_list`, train.py:231).

Semantics match torch-geometric exactly (validated against hand-computed
PyG math in tests):

* GCN: x' = D̂^{-1/2}(A + I)D̂^{-1/2} x W + b, self-loop weight 1.0, edge
  weights on off-diagonals.
* GAT (heads=H, concat=False): per head, e_ij = LeakyReLU₀.₂(a_dst·Wx_i +
  a_src·Wx_j) over j ∈ N(i) ∪ {i}, softmax over j, output averaged over
  heads plus bias.
* global_mean_pool = masked mean over valid nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def normalize_adjacency(adj: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """GCN symmetric normalization with self loops.

    Args:
      adj: (..., K, K) weighted adjacency; entries for invalid nodes must be 0.
      node_mask: (..., K) bool validity.
    Returns:
      (..., K, K) D̂^{-1/2}(A + I_valid)D̂^{-1/2}.
    """
    K = adj.shape[-1]
    eye = jnp.eye(K, dtype=adj.dtype)
    m = node_mask.astype(adj.dtype)
    a = adj + eye * m[..., None, :] * m[..., :, None]
    deg = jnp.sum(a, axis=-1)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return a * dinv[..., :, None] * dinv[..., None, :]


def gcn_layer(x: jnp.ndarray, adj_norm: jnp.ndarray, kernel: jnp.ndarray,
              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: (..., K, Cin), adj_norm: (..., K, K), kernel: (Cin, Cout)."""
    h = jnp.einsum("...kc,cd->...kd", x, kernel, precision="highest")
    out = jnp.einsum("...ij,...jd->...id", adj_norm, h, precision="highest")
    if bias is not None:
        out = out + bias
    return out


def gat_layer(x: jnp.ndarray, adj: jnp.ndarray, node_mask: jnp.ndarray,
              kernel: jnp.ndarray, att_src: jnp.ndarray, att_dst: jnp.ndarray,
              bias: jnp.ndarray | None = None, negative_slope: float = 0.2) -> jnp.ndarray:
    """Multi-head graph attention, heads averaged (concat=False).

    Args:
      x: (..., K, Cin)
      adj: (..., K, K) bool adjacency (self loops added internally)
      node_mask: (..., K) bool
      kernel: (Cin, H, C) per-head projection
      att_src / att_dst: (H, C) attention vectors (PyG's `att_src`/`att_dst`)
      bias: (C,) added after head averaging (PyG bias with concat=False)
    """
    K = x.shape[-2]
    h = jnp.einsum("...kc,chd->...khd", x, kernel, precision="highest")  # (..., K, H, C)
    a_src = jnp.einsum("...khd,hd->...kh", h, att_src)  # contribution of sender j
    a_dst = jnp.einsum("...khd,hd->...kh", h, att_dst)  # contribution of receiver i
    # logits[i, j, h] for message j -> i
    logits = a_dst[..., :, None, :] + a_src[..., None, :, :]
    logits = jax.nn.leaky_relu(logits, negative_slope=negative_slope)

    eye = jnp.eye(K, dtype=bool)
    m = node_mask
    allow = (adj | eye) & m[..., None, :] & m[..., :, None]
    logits = jnp.where(allow[..., None], logits, _NEG_INF)
    alpha = jax.nn.softmax(logits, axis=-2)
    alpha = jnp.where(allow[..., None], alpha, 0.0)

    out = jnp.einsum("...ijh,...jhd->...ihd", alpha, h, precision="highest")
    out = jnp.mean(out, axis=-2)  # average heads (concat=False)
    if bias is not None:
        out = out + bias
    return jnp.where(m[..., None], out, 0.0)


def masked_mean_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """global_mean_pool over valid nodes: (..., K, C), (..., K) → (..., C)."""
    m = node_mask.astype(x.dtype)
    s = jnp.sum(x * m[..., None], axis=-2)
    n = jnp.sum(m, axis=-1, keepdims=True)
    return s / jnp.maximum(n, 1.0)


def masked_batch_stats(x: jnp.ndarray, mask: jnp.ndarray):
    """Mean/variance over all valid positions of (..., C) with mask (...,).

    Equals torch BatchNorm1d statistics over the reference's block-diagonal
    node batch (population variance for normalization)."""
    m = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / n
    var = jnp.sum(((x - mean) ** 2) * m, axis=tuple(range(x.ndim - 1))) / n
    return mean, var, n
