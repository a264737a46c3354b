"""Label-map connectivity enforcement as a fixed-shape JAX program.

Replaces the connectivity pass of ``skimage.segmentation.slic``
(``_enforce_label_connectivity_cython``; reproduced host-side at
``tools/reference_pipeline.py:_enforce_connectivity``), which the reference
runs implicitly via skimage's ``enforce_connectivity=True`` default
(``/root/reference/models/region_graph/train.py:98``). Semantics:

1. split each cluster into 4-connected components,
2. merge components smaller than ``min_size = 0.5·H·W/n_segments`` into an
   adjacent surviving component (skimage absorbs into the first
   raster-order assigned ring pixel; here: the component owning the
   raster-first large-component ring pixel — identical except when a tiny
   island's only earlier-assigned neighbor is another tiny island, a
   sub-pixel-count corner case),
3. relabel survivors sequentially in raster order of their first pixel.

TPU formulation — no data-dependent shapes anywhere:

* Connected components: alternating row/column **segmented min-scans**
  (``lax.associative_scan`` with run-boundary resets at label changes),
  run under ``lax.while_loop`` to a fixed point. Each sweep propagates the
  min raster index along entire rows and columns at once with zero
  gathers — dynamic gathers (the classic pointer-jumping ``comp[comp]``)
  cost ~15 ms per sweep on this TPU for a 16×256² batch and dominated the
  original formulation; scans are pure vector ops and make the whole pass
  ~20× cheaper. Convergence takes O(staircase complexity of the
  component) sweeps — single digits for SLIC fragments, which live inside
  ±step search boxes.
* Component sizes / merge targets: ``segment_sum`` / ``segment_min``
  scatters keyed by the component root (min pixel index — a canonical id
  that needs no compaction).
* Sequential relabel: sort the per-pixel roots, rank the uniques by
  cumulative sum, scatter ranks back — raster order of first pixels equals
  ascending root order by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MERGE_ROUNDS = 3  # islands chained to islands (matches the reference pass)


def _neighbor_shifts(x: jnp.ndarray, fill):
    """The four 4-connected neighbor maps of a 2-D array, edge-filled."""
    up = jnp.concatenate([jnp.full_like(x[:1], fill), x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], jnp.full_like(x[:1], fill)], axis=0)
    left = jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)
    return up, down, left, right


def _seg_min_scan(comp: jnp.ndarray, labels: jnp.ndarray,
                  axis: int) -> jnp.ndarray:
    """Min of ``comp`` over each run of equal ``labels`` along ``axis``
    (forward + backward segmented scans — no gathers)."""

    def combine(a, b):
        m1, r1 = a
        m2, r2 = b
        return jnp.where(r2, m2, jnp.minimum(m1, m2)), r1 | r2

    def one_direction(reverse):
        if reverse:
            nxt = jnp.roll(labels, -1, axis=axis)
            reset = labels != nxt
            # last element along the axis starts a (reversed) run
            idx = [slice(None)] * labels.ndim
            idx[axis] = slice(-1, None)
            reset = reset.at[tuple(idx)].set(True)
        else:
            prev = jnp.roll(labels, 1, axis=axis)
            reset = labels != prev
            idx = [slice(None)] * labels.ndim
            idx[axis] = slice(0, 1)
            reset = reset.at[tuple(idx)].set(True)
        m, _ = jax.lax.associative_scan(combine, (comp, reset), axis=axis,
                                        reverse=reverse)
        return m

    return jnp.minimum(one_direction(False), one_direction(True))


def connected_components(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel component root (min raster index) of the 4-connected
    components of an (H, W) int label map."""
    H, W = labels.shape
    HW = H * W
    idx = jnp.arange(HW, dtype=jnp.int32).reshape(H, W)

    def sweep(comp):
        comp = _seg_min_scan(comp, labels, axis=1)
        comp = _seg_min_scan(comp, labels, axis=0)
        return comp

    def cond(state):
        comp, prev_done = state
        return ~prev_done

    def body(state):
        comp, _ = state
        new = sweep(comp)
        return new, jnp.array_equal(new, comp)

    comp, _ = jax.lax.while_loop(cond, body, (idx, jnp.asarray(False)))
    return comp


@functools.partial(jax.jit, static_argnames=("n_segments", "min_size_factor"))
def enforce_label_connectivity(labels: jnp.ndarray, n_segments: int,
                               min_size_factor: float = 0.5) -> jnp.ndarray:
    """skimage-contract connectivity pass; returns 0-based sequential
    raster-ordered component labels."""
    H, W = labels.shape
    HW = H * W
    min_size = jnp.int32(round(min_size_factor * H * W / n_segments))
    big = jnp.int32(HW)
    idx_flat = jnp.arange(HW, dtype=jnp.int32)

    comp = connected_components(labels)

    # Compact the root space ONCE: component roots are min pixel indices in
    # [0, HW), but there are at most a few thousand components — ranking
    # them first makes every merge-round scatter/gather work on a C-sized
    # table instead of an HW-sized one (HW-table dynamic gathers are the
    # single slowest primitive on this TPU). Raster order of first pixels
    # equals ascending root order, so ranks ARE the sequential relabel.
    C = min(16 * n_segments, HW)  # generous static bound on component count
    flat = comp.ravel()
    order = jnp.sort(flat)
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (order[1:] != order[:-1]).astype(jnp.int32)])
    ranks = jnp.cumsum(is_first) - 1
    rank_of = jnp.zeros((HW,), jnp.int32).at[order].set(ranks)
    # Clamp defends the static bound in pathological fragment blow-ups
    # (merges any overflow fragments into the last id).
    comp = jnp.minimum(rank_of[flat], C - 1).reshape(H, W)  # ids in [0, C)
    # Root pixel (min raster index) per compact id — preserves raster order
    # for the final relabel after merging.
    root_pix = jax.ops.segment_min(idx_flat, comp.ravel(), num_segments=C)

    for _ in range(_MERGE_ROUNDS):
        flat = comp.ravel()
        sizes = jax.ops.segment_sum(jnp.ones((HW,), jnp.int32), flat,
                                    num_segments=C)
        small = (sizes[flat] < min_size).reshape(H, W)

        # For every pixel of a small component: raster index of 4-neighbors
        # that belong to a LARGE component; segment_min over the component
        # picks skimage's "first assigned ring pixel in raster order".
        comp_n = _neighbor_shifts(comp, -1)
        small_n = _neighbor_shifts(small, True)
        nbr_idx = _neighbor_shifts(
            idx_flat.reshape(H, W), big)
        best = jnp.full((H, W), big, jnp.int32)
        for cn, sn, ni in zip(comp_n, small_n, nbr_idx):
            ok = (cn >= 0) & (cn != comp) & (~sn)
            best = jnp.minimum(best, jnp.where(ok, ni, big))
        best = jnp.where(small, best, big)

        target_pix = jax.ops.segment_min(best.ravel(), flat, num_segments=C)
        # id -> absorbing id (large neighbor's component), else identity.
        # flat[target_pix] is a C-sized gather from the pixel map.
        safe_pix = jnp.minimum(target_pix, big - 1)
        absorb = jnp.where(target_pix < big, flat[safe_pix],
                           jnp.arange(C, dtype=jnp.int32))
        comp = absorb[flat].reshape(H, W)

    # Sequential relabel of survivors by raster order of their first pixel
    # = ascending root_pix order (C-sized sort, not HW-sized).
    flat = comp.ravel()
    surv_pix = jnp.where(
        jax.ops.segment_sum(jnp.ones((HW,), jnp.int32), flat,
                            num_segments=C) > 0,
        root_pix, big)
    rank = jnp.argsort(jnp.argsort(surv_pix))  # dense ranks by root pixel
    return rank[flat].reshape(H, W)
