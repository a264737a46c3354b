"""Per-superpixel feature extraction as one pass of segment reductions.

TPU-native replacement for the reference's per-region Python hot loop
(``/root/reference/models/region_graph/train.py:112-179``,
~O(regions · H·W) with two scipy dilations per region — the measured
2.2 s/image bottleneck).  Here every region statistic is a scatter-add
(`segment_sum`) or a dedup'd neighbor-label scatter, all fixed-shape and
fused by XLA; the whole 15-feature extraction is O(H·W) work.

Exact semantics preserved (verified by golden tests vs a direct numpy port
of the reference loop):

* mean/std of RGB and gray (population std, like numpy ``.std()``),
* center_x/center_y normalized by W/H (the reference hardcodes 256),
* region_size = |region| / (H·W),
* perimeter  = |dilate₁(region) \\ region| with the 4-connected cross
  (scipy default structuring element),
* compactness = perimeter² / (4π·area + 1e-10),
* boundary contrast = ‖mean_color(region) − mean_color(dilate₂ \\ region)‖,
* edge density = mean of the Canny map over the region,
* local variance = population variance of gray (so feature 7 = sqrt(f14)).

Feature vector layout (index → meaning) — note the reference's "edge_diff"
in the RAG weight actually reads index 12 which is *boundary contrast*, not
edge density (train.py:201 vs the feature concat at :153-164); we preserve
that behavior.

  0-2 mean RGB | 3-5 std RGB | 6 texture_mean | 7 texture_std
  8 center_x | 9 center_y | 10 region_size | 11 compactness
  12 contrast | 13 edge_density | 14 local_variance

Perimeter/contrast trick: a pixel p belongs to ``dilateᵣ(region R) \\ R``
iff some label within city-block distance r of p equals R and seg(p) ≠ R.
So instead of materializing a (K, H, W) one-hot stack, each pixel
contributes one unit (or its color) to every *distinct* neighbor label in
its radius-r diamond — dedup over ≤4 (r=1) or ≤12 (r=2) gathered labels is
a handful of vectorized comparisons.  The per-offset contributions are then
reindexed from "p scatters to seg(p+off)" to "p+off receives from p"
(a static roll), which makes all twelve offsets share ``seg`` as their
scatter index — so the entire feature extraction is exactly ONE HW-sized
segment_sum (17 payload channels).  Scatters cost per element on this TPU;
this is the difference between 84 and 17 scattered channel-elements/pixel.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# City-block offsets at distance exactly 1..r for the cross-structuring
# element dilation. r=1: 4 offsets; r=2: 12 offsets.
_DIAMOND_1 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
_DIAMOND_2 = _DIAMOND_1 + [(-2, 0), (2, 0), (0, -2), (0, 2), (-1, -1), (-1, 1), (1, -1), (1, 1)]


def _gather_neighbor_labels(seg: jnp.ndarray, offsets) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each pixel, labels at the given offsets. Returns (labels, valid)
    of shape (H, W, n_off); out-of-image neighbors are invalid."""
    H, W = seg.shape
    labs = []
    valids = []
    for dy, dx in offsets:
        lab = jnp.roll(seg, (-dy, -dx), axis=(0, 1))  # value at (y+dy, x+dx)
        ok = jnp.ones((H, W), dtype=bool)
        if dy > 0:
            ok = ok.at[H - dy:, :].set(False)
        elif dy < 0:
            ok = ok.at[: -dy, :].set(False)
        if dx > 0:
            ok = ok.at[:, W - dx:].set(False)
        elif dx < 0:
            ok = ok.at[:, : -dx].set(False)
        labs.append(lab)
        valids.append(ok)
    return jnp.stack(labs, axis=-1), jnp.stack(valids, axis=-1)


def _distinct_foreign_neighbors(seg: jnp.ndarray, offsets):
    """(labels, weight) where weight[p, i] = 1 iff offsets[i]'s label is
    valid, differs from seg[p], and is the first occurrence among the
    gathered labels (dedup)."""
    labs, valid = _gather_neighbor_labels(seg, offsets)
    n = labs.shape[-1]
    keep = valid & (labs != seg[..., None])
    for i in range(1, n):
        dup = jnp.zeros(seg.shape, dtype=bool)
        for j in range(i):
            dup = dup | (keep[..., j] & (labs[..., j] == labs[..., i]))
        keep = keep.at[..., i].set(keep[..., i] & ~dup)
    return labs, keep


def _segment_sum_matmul(vals: jnp.ndarray, seg: jnp.ndarray, K: int,
                        block: int | None = None) -> jnp.ndarray:
    """(N, C) values summed into (K, C) bins as ``Pᵀ @ vals`` on the MXU.

    Drop-in for ``jax.ops.segment_sum`` with out-of-range indices dropped.
    Products are exact (``precision="highest"``: 1.0 · v reassembles v
    losslessly from its bf16x6 parts); only the f32 accumulation order
    differs from the scatter form. Blocked scan keeps ≤ block·K one-hot
    elements alive; vmap-safe (scan stays sequential per image).
    """
    N, C = vals.shape
    if block is None:
        block = max(256, (4 << 20) // max(K, 1))
    pad = (-N) % block
    if pad:
        seg = jnp.concatenate([seg, jnp.full((pad,), K, seg.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, C), vals.dtype)])
    nb = (N + pad) // block
    iota = jnp.arange(K, dtype=seg.dtype)

    def body(acc, inp):
        s_c, v_c = inp
        P = (s_c[:, None] == iota).astype(jnp.float32)
        return acc + jnp.einsum("pk,pc->kc", P, v_c,
                                precision="highest",
                                preferred_element_type=jnp.float32), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((K, C), jnp.float32),
        (seg.reshape(nb, block), vals.reshape(nb, block, C)))
    return out


@functools.partial(jax.jit, static_argnames=("num_segments", "norm_size"))
def region_features(image: jnp.ndarray, segments: jnp.ndarray, edges: jnp.ndarray,
                    num_segments: int,
                    norm_size: int | None = None) -> Dict[str, jnp.ndarray]:
    """Compute the 15-dim node features for every segment.

    Args:
      image: (H, W, 3) float RGB in [0, 1] (the denormalized image the
        reference feeds its feature loop).
      segments: (H, W) int32 labels in [0, num_segments).
      edges: (H, W) Canny edge map (bool or float).
      num_segments: static K (padded node bucket).
      norm_size: positional-feature normalizer. None (default) divides
        center_x/center_y/region_size by the ACTUAL W/H/(H·W) — the
        documented Known-delta fix. The reference hard-codes 256
        (``region_graph/train.py:156-160``: ``/256``, ``/(256*256)`` at any
        resolution), so pass ``norm_size=256`` for bug-compatible features
        when measuring composed fidelity against reference-recipe weights
        at non-256 sizes (at 256 the two are identical). This was the
        entire 352² composed-fidelity gap: a probe trained on /256
        features read /352 features as out-of-distribution (VERDICT r4
        item 1 bisect).

    Returns dict with:
      features: (K, 15) float32
      node_mask: (K,) bool — True where the segment has ≥1 pixel
      count: (K,) float32 pixel counts
    """
    H, W, _ = image.shape
    K = num_segments
    seg_flat = segments.reshape(-1)
    img_flat = image.reshape(-1, 3).astype(jnp.float32)
    gray = image.astype(jnp.float32) @ jnp.asarray([0.2989, 0.5870, 0.1140], jnp.float32)
    gray_flat = gray.reshape(-1)
    edge_flat = edges.reshape(-1).astype(jnp.float32)

    yy = (jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)).reshape(-1)
    xx = (jnp.ones((H, 1), jnp.float32) * jnp.arange(W, dtype=jnp.float32)[None, :]).reshape(-1)

    # Boundary-neighbor sums WITHOUT per-offset scatters.  The natural form
    # is one segment_sum per offset i with index labs_i[p] = seg[p + off_i]
    # (12 HW-sized scatters — they dominated this stage at ~2/3 of its
    # cost).  Reindexing q = p + off_i turns every one of them into a
    # scatter over the SAME index array seg[q]: the contribution of source
    # pixel p to bin seg[p + off_i] is payload_i shifted by +off_i.  Since
    # the twelve results are summed anyway, the shifted payloads can be
    # pre-summed with rolls (regular ops, ~100× cheaper than scatters) and
    # the whole neighbor accumulation rides the single moment segment_sum
    # below as five extra payload channels.  Roll wrap-around is harmless:
    # a wrapped source is exactly one whose own neighbor was out-of-image,
    # so its dedup weight is already zero.  Perimeter = the r=1 subset
    # (_DIAMOND_2 lists the four r=1 offsets first, so keep₂ restricted to
    # slots 0-3 dedups only against those slots and equals keep₁ exactly).
    labs2, keep2 = _distinct_foreign_neighbors(segments, _DIAMOND_2)
    del labs2  # only the dedup weights are needed in the reindexed form
    img_hw = image.astype(jnp.float32)
    nb_acc = jnp.zeros((H, W, 5), jnp.float32)
    for i, (dy, dx) in enumerate(_DIAMOND_2):
        w = keep2[..., i].astype(jnp.float32)
        is_r1 = jnp.float32(1.0 if i < len(_DIAMOND_1) else 0.0)
        pay = jnp.concatenate(
            [img_hw * w[..., None], w[..., None], (is_r1 * w)[..., None]],
            axis=-1)
        nb_acc = nb_acc + jnp.roll(pay, (dy, dx), axis=(0, 1))

    # Every region statistic in ONE 17-channel segment reduction — computed
    # on the MXU as ``Pᵀ @ vals`` (P = the (HW, K) label one-hot) instead of
    # a segment_sum scatter: HW-indexed scatters cost ~8 ns per index on
    # this TPU (~1 ms per HW at 352²) while the 2·HW·K·17 ≈ 2.4 GFLOP
    # contraction is MXU noise. ``precision="highest"`` keeps products
    # EXACT (each is 1.0 · v — the bf16x6 decomposition reassembles v
    # losslessly); accumulation is f32 either way, only the reduction order
    # differs from segment_sum (within the golden tests' 2e-4 rtol).
    # Pixels stream through a scan over row blocks so only ~(block × K)
    # bf16 one-hot rows are alive at once.
    vals = jnp.concatenate(
        [
            img_flat,                     # 0:3   sum rgb
            img_flat**2,                  # 3:6   sum rgb²
            gray_flat[:, None],           # 6     sum gray
            (gray_flat**2)[:, None],      # 7     sum gray²
            yy[:, None],                  # 8     sum y
            xx[:, None],                  # 9     sum x
            edge_flat[:, None],           # 10    sum edge
            jnp.ones((H * W, 1), jnp.float32),  # 11 count
            nb_acc.reshape(-1, 5),        # 12:15 nb rgb, 15 nb count, 16 peri
        ],
        axis=-1,
    )
    m = _segment_sum_matmul(vals, seg_flat, K)
    count = m[:, 11]
    node_mask = count > 0
    safe = jnp.maximum(count, 1.0)[:, None]

    mean_rgb = m[:, 0:3] / safe
    var_rgb = jnp.maximum(m[:, 3:6] / safe - mean_rgb**2, 0.0)
    std_rgb = jnp.sqrt(var_rgb)
    mean_gray = m[:, 6:7] / safe
    var_gray = jnp.maximum(m[:, 7:8] / safe - mean_gray**2, 0.0)
    std_gray = jnp.sqrt(var_gray)
    norm_h = norm_size if norm_size is not None else H
    norm_w = norm_size if norm_size is not None else W
    center_y = (m[:, 8:9] / safe) / norm_h
    center_x = (m[:, 9:10] / safe) / norm_w
    region_size = count[:, None] / (norm_h * norm_w)
    edge_density = m[:, 10:11] / safe

    # Boundary contrast: mean color of dilate₂(R) \ R vs mean color of R;
    # perimeter: |dilate₁(R) \ R| (4-conn cross).  Both were accumulated by
    # the reindexed roll-sum above and arrived through the single
    # segment_sum as channels 12:17.
    nb = m[:, 12:17]
    peri = nb[:, 4:5]
    compactness = peri**2 / (4.0 * math.pi * count[:, None] + 1e-10)
    nb_sum, nb_cnt = nb[:, :3], nb[:, 3]
    nb_mean = nb_sum / jnp.maximum(nb_cnt, 1.0)[:, None]
    has_nb = (nb_cnt > 0)[:, None]
    contrast = jnp.where(
        has_nb,
        jnp.sqrt(jnp.sum((mean_rgb - nb_mean) ** 2, axis=-1, keepdims=True)),
        0.0,
    )

    features = jnp.concatenate(
        [
            mean_rgb, std_rgb, mean_gray, std_gray,
            center_x, center_y, region_size, compactness,
            contrast, edge_density, var_gray,
        ],
        axis=-1,
    )
    features = jnp.where(node_mask[:, None], features, 0.0)
    features = jnp.nan_to_num(features, nan=0.0)
    return {"features": features, "node_mask": node_mask, "count": count}


@functools.partial(jax.jit, static_argnames=("num_segments",))
def region_label_means(maps: jnp.ndarray, segments: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Per-segment mean of one or more (H, W) maps → (K, C).

    Used for GT labels: the reference thresholds per-region means of the
    object/instance/edge masks at 0.5/0.5/0.3 (train.py:168-176)."""
    if maps.ndim == 2:
        maps = maps[..., None]
    H, W, C = maps.shape
    seg_flat = segments.reshape(-1)
    vals = jnp.concatenate(
        [maps.reshape(-1, C).astype(jnp.float32), jnp.ones((H * W, 1), jnp.float32)],
        axis=-1,
    )
    m = jax.ops.segment_sum(vals, seg_flat, num_segments=num_segments)
    return m[:, :C] / jnp.maximum(m[:, C:], 1.0)
