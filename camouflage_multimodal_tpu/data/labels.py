"""Image-level label heuristic from GT masks.

Behavioral port of ``extract_label_from_mask``
(``/root/reference/models/multimodal/train_multimodal.py:62-92``): thresholds
on mask mean intensity, non-zero ratio, Canny edge ratio and external-contour
count decide (label, confidence) for the multimodal classifier's targets.

Runs host-side with cv2 when available (bit-exact with the reference's
decisions); falls back to an equivalent pure numpy/JAX path (Canny kernel +
connected-components count) otherwise.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _stats_cv2(mask: np.ndarray):
    edges = cv2.Canny(mask, 50, 150)
    edge_ratio = (edges > 0).sum() / mask.size
    _, binary = cv2.threshold(mask, 10, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    complexity = len(contours)
    return edge_ratio, complexity


def _stats_fallback(mask: np.ndarray):
    """cv2-free approximation: JAX Canny on the normalized mask and a
    scipy connected-components count of the binarized mask (external
    contour count == number of 8-connected foreground components for
    RETR_EXTERNAL, holes excluded)."""
    import scipy.ndimage as ndi

    import jax.numpy as jnp

    from camouflage_multimodal_tpu.ops.canny import canny

    edges = np.asarray(canny(jnp.asarray(mask.astype(np.float32) / 255.0), sigma=1.0))
    edge_ratio = edges.sum() / mask.size
    binary = mask > 10
    _, complexity = ndi.label(binary, structure=np.ones((3, 3)))
    return edge_ratio, complexity


def extract_label_from_mask(mask_or_path, threshold: float = 0.1) -> Tuple[int, float]:
    """(label, confidence) from a GT mask path or uint8 array."""
    if isinstance(mask_or_path, str):
        if _HAS_CV2:
            mask = cv2.imread(mask_or_path, cv2.IMREAD_GRAYSCALE)
        else:  # pragma: no cover
            from PIL import Image

            mask = np.asarray(Image.open(mask_or_path).convert("L"))
        if mask is None:
            return 0, 0.0
    else:
        mask = np.asarray(mask_or_path, dtype=np.uint8)

    mask_norm = mask.astype(float) / 255.0
    mean_intensity = mask_norm.mean()
    non_zero_ratio = (mask > 10).sum() / mask.size

    edge_ratio, complexity = _stats_cv2(mask) if _HAS_CV2 else _stats_fallback(mask)

    if mean_intensity > threshold and non_zero_ratio > 0.05:
        if edge_ratio < 0.02 or complexity > 10:
            label = 1
            confidence = min(mean_intensity * 2, 1.0)
        else:
            label = 1
            confidence = mean_intensity
    else:
        label = 0
        confidence = 1.0 - mean_intensity

    return label, float(confidence)
