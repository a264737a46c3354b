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
    map using 8-connectivity."""
    K = num_segments
    s = segments
    pairs = [
        (s[:, :-1], s[:, 1:]),      # horizontal
        (s[:-1, :], s[1:, :]),      # vertical
        (s[:-1, :-1], s[1:, 1:]),   # diagonal ↘
        (s[:-1, 1:], s[1:, :-1]),   # diagonal ↙
    ]
    # ONE scatter call for all four directions (scatter cost on this TPU is
    # per scattered element, so four separate .at[].set calls over the same
    # pairs would serialize identically but pay four dispatch floors), with
    # the pair pre-encoded into a single flat index: a 1-D scatter lowers
    # measurably cheaper than the 2-D-index form (5.6 vs 5.9 ms/img at
    # 16×352², same result).
    a_all = jnp.concatenate([a.reshape(-1) for a, _ in pairs])
    b_all = jnp.concatenate([b.reshape(-1) for _, b in pairs])
    # Labels ≥ K (possible when a caller skips the connectivity relabel's
    # max_labels clamp) must DROP, matching the old 2-D ``.at[a, b]`` form —
    # pair-encoded, an out-of-range label would otherwise alias into a wrong
    # row (e.g. label 6 at K=4 lands in adj[1, 2]). Route them to the
    # out-of-bounds flat index K·K, which the scatter's drop mode discards.
    idx = jnp.where((a_all < K) & (b_all < K), a_all * K + b_all, K * K)
    flat = jnp.zeros((K * K,), dtype=jnp.bool_).at[idx].set(True)
    adj = flat.reshape(K, K)
    # One transpose-OR instead of a second scatter pass over the reversed
    # pairs (the K×K OR is negligible).
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
