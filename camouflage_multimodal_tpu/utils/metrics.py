"""Numpy-facing metric API matching the reference signatures
(``/root/reference/utils/metrics.py``), backed by the jitted JAX reductions
in :mod:`camouflage_multimodal_tpu.eval.metrics`."""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.eval import metrics as jm


def _as_f32(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def calculate_iou(pred, gt, threshold: float = 0.5) -> float:
    return float(jm.iou(_as_f32(pred), _as_f32(gt), threshold))


def calculate_dice(pred, gt, threshold: float = 0.5) -> float:
    return float(jm.dice(_as_f32(pred), _as_f32(gt), threshold))


def calculate_precision_recall_f1(pred, gt, threshold: float = 0.5):
    p, r, f1 = jm.precision_recall_f1(_as_f32(pred), _as_f32(gt), threshold)
    return float(p), float(r), float(f1)


def calculate_mae(pred, gt) -> float:
    return float(jm.mae(_as_f32(pred), _as_f32(gt)))


def calculate_accuracy(pred, gt) -> float:
    """Pixel accuracy on already-binarized inputs (reference
    utils/metrics.py:50-55 compares with ``==``)."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    return float(np.sum(pred == gt) / pred.size)


def evaluate_segmentation(pred_mask, gt_mask, threshold: float = 0.5) -> Dict[str, float]:
    out = jm.evaluate_segmentation(_as_f32(pred_mask), _as_f32(gt_mask), threshold)
    return {k: float(v) for k, v in out.items()}


def batch_evaluate(pred_masks: Sequence, gt_masks: Sequence, threshold: float = 0.5) -> Dict[str, float]:
    preds = jnp.stack([_as_f32(p) for p in pred_masks])
    gts = jnp.stack([_as_f32(g) for g in gt_masks])
    out = jm.batch_evaluate(preds, gts, threshold)
    return {k: float(v) for k, v in out.items()}
