"""Region adjacency graph as dense fixed-shape ops.

Replaces ``skimage.graph.rag_mean_color`` + the per-edge Python weight loop
(``/root/reference/models/region_graph/train.py:187-208``).  The adjacency
comes from 8-connected label transitions in the segment map (rag_mean_color's
default ``connectivity=2``); edge weights are the reference's Gaussian
product computed densely for all K×K pairs on the VPU and masked by the
adjacency — at K≤512 the dense form is trivially cheap and removes every
dynamic shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

@functools.partial(jax.jit, static_argnames=("num_segments",))
def region_adjacency(segments: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """(K, K) bool symmetric adjacency (no self loops) from an (H, W) label
    map using 8-connectivity.

    Formulation: scatter cost on this TPU is dominated by the INDEX count
    (~8 ns per scattered index, largely independent of the value payload
    width), so instead of one index per directed neighbor PAIR (4·H·W
    indices — the previous pair-encoded form measured ~5.6 ms/img at
    16×352²), every pixel scatters ONE row: a K-lane boolean one-hot of its
    four forward neighbors (→, ↓, ↘, ↙ — the backward four are restored by
    the final ``adj | adj.T``), max-combined into the (K, K) table.
    ``max`` over bool IS logical OR, so duplicate rows combine exactly.
    H·W indices instead of 4·H·W. The (H·W, K) one-hot operand is built in
    static pixel chunks to bound materialization (scatter operands cannot
    fuse into their producer).

    Out-of-range labels (callers that skip the connectivity relabel's
    ``max_labels`` clamp) must DROP, matching ``rag_mean_color`` fed an
    in-range map: a key ≥ K routes to dump row K (sliced off), a neighbor
    value ≥ K matches no one-hot lane.
    """
    K = num_segments
    s = segments
    right = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    down = jnp.concatenate([s[1:, :], s[-1:, :]], axis=0)
    # ↘ = down-of-right; ↙ = down-of-left. Border fills duplicate the edge
    # row/column, so every fill is a self pair (stripped by the eye mask) or
    # a pair the plain →/↓ shifts already produce — never a new adjacency.
    dr = jnp.concatenate([right[1:, :], right[-1:, :]], axis=0)
    left = jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
    dl = jnp.concatenate([left[1:, :], left[-1:, :]], axis=0)

    key = jnp.where(s < K, s, K).ravel()
    nbrs = jnp.stack(
        [right.ravel(), down.ravel(), dr.ravel(), dl.ravel()], axis=-1)
    iota = jnp.arange(K, dtype=s.dtype)
    HW = key.shape[0]
    # ≤ ~20 MB of one-hot rows alive per chunk (per vmapped image).
    n_chunks = max(1, -(-HW * K // (20 << 20)))
    chunk = -(-HW // n_chunks)
    acc = jnp.zeros((K + 1, K), dtype=jnp.bool_)
    for c in range(0, HW, chunk):
        onehot = jnp.any(nbrs[c:c + chunk, :, None] == iota, axis=1)
        acc = acc.at[key[c:c + chunk]].max(onehot)
    adj = acc[:K]
    adj = adj | adj.T
    adj = adj & ~jnp.eye(K, dtype=bool)
    return adj


@jax.jit
def rag_edge_weights(features: jnp.ndarray, adjacency: jnp.ndarray) -> jnp.ndarray:
    """Dense (K, K) edge weights with the reference's Gaussian product
    (train.py:199-206):

      w = exp(-‖Δmean_rgb‖/0.15) · exp(-|Δf6|/0.08) · exp(-|Δf12|/0.1)

    where f6 = texture_mean and f12 = boundary contrast (the reference's
    comment calls f12 "edge_diff" but indexes the contrast feature).
    Entries outside the adjacency are zero.
    """
    color = features[:, 0:3]
    tex = features[:, 6]
    ctr = features[:, 12]
    # Direct pairwise differences: (K, K, 3) is tiny at K≤512 and avoids the
    # catastrophic cancellation of the ‖a‖²+‖b‖²−2ab expansion.
    dcolor = jnp.sqrt(
        jnp.sum((color[:, None, :] - color[None, :, :]) ** 2, axis=-1)
    )
    dtex = jnp.abs(tex[:, None] - tex[None, :])
    dctr = jnp.abs(ctr[:, None] - ctr[None, :])
    w = jnp.exp(-dcolor / 0.15) * jnp.exp(-dtex / 0.08) * jnp.exp(-dctr / 0.1)
    return jnp.where(adjacency, w, 0.0)
