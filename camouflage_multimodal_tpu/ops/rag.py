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

def _forward_neighbor_maps(s: jnp.ndarray):
    """Four forward-shifted 8-connectivity neighbor maps (→, ↓, ↘, ↙).
    Border fills duplicate the edge row/column, so every fill is a self
    pair (stripped by the eye mask) or a pair the plain →/↓ shifts already
    produce — never a new adjacency. The backward four directions are
    restored by the caller's final ``adj | adj.T``."""
    right = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    down = jnp.concatenate([s[1:, :], s[-1:, :]], axis=0)
    dr = jnp.concatenate([right[1:, :], right[-1:, :]], axis=0)
    left = jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
    dl = jnp.concatenate([left[1:, :], left[-1:, :]], axis=0)
    return right, down, dr, dl


@functools.partial(jax.jit, static_argnames=("num_segments",))
def region_adjacency(segments: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """(K, K) bool symmetric adjacency (no self loops) from an (H, W) label
    map using 8-connectivity.

    MXU formulation: ``adj = (Pᵀ @ S) > 0`` where ``P`` is the (HW, K)
    bf16 one-hot of the label map and ``S`` the sum of the four
    forward-shifted one-hots (values in [0, 4], exact in bf16; the
    contraction accumulates in f32, exact below 2²⁴). On this TPU every
    HW-indexed scatter costs ~8 ns per index regardless of payload (~1 ms
    per HW at 352²), while the MXU does the equivalent 2·HW·K² ≈ 82 GFLOP
    contraction in well under a millisecond — the scatter-free rewrite of
    the previous one-hot ``.at[key].max`` form. Pixels stream through a
    ``lax.scan`` over row blocks so only ~(2 × block × K) bf16 one-hot
    rows are ever materialized (vmap-safe: scan stays sequential per
    image).

    Out-of-range labels (callers that skip the connectivity relabel's
    ``max_labels`` clamp) must DROP, matching ``rag_mean_color`` fed an
    in-range map: a label ≥ K matches no one-hot lane on either side.
    """
    K = num_segments
    s = segments
    H, W = s.shape
    right, down, dr, dl = _forward_neighbor_maps(s)

    # Row-block size: ~8 MB of bf16 one-hot per operand per step.
    rows = max(1, (4 << 20) // max(W * K, 1))
    pad = (-H) % rows
    if pad:
        fill = jnp.full((pad, W), jnp.int32(K))  # matches no lane
        s, right, down, dr, dl = (
            jnp.concatenate([a, fill.astype(a.dtype)], axis=0)
            for a in (s, right, down, dr, dl))
    nb = (H + pad) // rows

    def blocks(a):
        return a.reshape(nb, rows * W)

    iota = jnp.arange(K, dtype=s.dtype)

    def body(acc, inp):
        s_c, r_c, d_c, dr_c, dl_c = inp
        P = (s_c[:, None] == iota).astype(jnp.bfloat16)
        S = ((r_c[:, None] == iota).astype(jnp.bfloat16)
             + (d_c[:, None] == iota).astype(jnp.bfloat16)
             + (dr_c[:, None] == iota).astype(jnp.bfloat16)
             + (dl_c[:, None] == iota).astype(jnp.bfloat16))
        acc = acc + jnp.einsum("pk,pj->kj", P, S,
                               preferred_element_type=jnp.float32)
        return acc, None

    counts, _ = jax.lax.scan(
        body, jnp.zeros((K, K), jnp.float32),
        tuple(blocks(a) for a in (s, right, down, dr, dl)))
    adj = counts > 0
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
