"""Reference-side composed pipeline in numpy/scipy/torch for the fidelity gate.

skimage / torch_geometric are not installed here, so the reference scripts
cannot run verbatim. This module re-creates the reference's image→graph→
heatmap stack faithfully from its published algorithms and the reference
source:

* :func:`slic_np` — canonical SLIC (Achanta et al.) with skimage's knobs:
  CIELAB features, Gaussian pre-smoothing, ~``step``-spaced grid seeds,
  10 k-means iterations over a ±2·step search window, connectivity
  enforcement with ``min_size_factor=0.5``, sequential relabeling with
  ``start_label=1`` (the skimage ≥0.21 default the reference pins —
  region_graph/requirements.txt).
* :func:`canny_np` — skimage-style Canny: bleed-corrected Gaussian,
  Sobel gradients, bilinear-interpolated NMS, double threshold (0.1/0.2)
  + connected-component hysteresis.
* :func:`build_reference_graph` — the reference's per-region 15-feature
  loop, 8-connected RAG edges and Gaussian-product edge weights
  (train.py:89-221 semantics, including the f12 "edge_diff" feature-index
  quirk).
* :func:`reference_heatmap` — the paint-back of test.py:241-244. NOTE:
  with start_label=1 segment labels, the reference indexes
  ``mask_probs[region_id]`` directly while node ``i`` belongs to label
  ``i+1`` — an off-by-one label shift in the reference itself.
  ``mapping="verbatim"`` reproduces that behavior; ``mapping="corrected"``
  applies the region_id_map the reference builds but forgets to use.

Used by scripts/fidelity_gate.py and the fidelity tests. torch/numpy only —
never imported from camouflage_multimodal_tpu/.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import scipy.ndimage as ndi
import torch

GRAY_WEIGHTS = np.array([0.2989, 0.5870, 0.1140])

_XYZ_FROM_RGB = np.array([
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
])
_D65_WHITE = np.array([0.95047, 1.0, 1.08883])


def rgb2lab_np(rgb: np.ndarray) -> np.ndarray:
    """sRGB [0,1] → CIELAB (D65), standard formulas."""
    srgb = np.clip(rgb, 0.0, 1.0)
    linear = np.where(srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92)
    xyz = linear @ _XYZ_FROM_RGB.T
    t = xyz / _D65_WHITE
    delta = 6.0 / 29.0
    f = np.where(t > delta**3, np.cbrt(t), t / (3 * delta**2) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


# ---------------------------------------------------------------------------
# SLIC
# ---------------------------------------------------------------------------

def _enforce_connectivity(labels: np.ndarray, n_segments: int,
                          start_label: int = 1,
                          min_size_factor: float = 0.5) -> np.ndarray:
    """Split disconnected segments, merge tiny components into an adjacent
    already-relabeled neighbor, relabel sequentially from ``start_label`` in
    raster-scan order (the observable contract of skimage's
    _enforce_label_connectivity_cython)."""
    H, W = labels.shape
    min_size = int(round(min_size_factor * H * W / n_segments))
    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])  # 4-connectivity

    # Connected components of the raw label map, globally numbered.
    comp = np.zeros((H, W), np.int64)
    n_total = 0
    for seg_id in np.unique(labels):
        c, n = ndi.label(labels == seg_id, structure=structure)
        comp[c > 0] = c[c > 0] + n_total
        n_total += n

    flat = comp.ravel()
    first_pix = np.full(n_total + 1, flat.size, np.int64)
    np.minimum.at(first_pix, flat, np.arange(flat.size))
    sizes = np.bincount(flat, minlength=n_total + 1)
    raster_order = sorted(range(1, n_total + 1), key=lambda c: first_pix[c])

    out = np.zeros((H, W), np.int64)
    next_label = start_label
    deferred = []
    for c in raster_order:
        mask = comp == c
        if sizes[c] >= min_size:
            out[mask] = next_label
            next_label += 1
        else:
            # merge into an adjacent already-assigned label (scan order means
            # one almost always exists; defer the rare exceptions)
            ring = ndi.binary_dilation(mask) & ~mask
            neighbors = out[ring]
            neighbors = neighbors[neighbors >= start_label]
            if neighbors.size:
                out[mask] = neighbors[0]
            else:
                deferred.append(mask)
    for _ in range(3):  # small islands chained to other small islands
        still = []
        for mask in deferred:
            ring = ndi.binary_dilation(mask) & ~mask
            neighbors = out[ring]
            neighbors = neighbors[neighbors >= start_label]
            if neighbors.size:
                out[mask] = neighbors[0]
            else:
                still.append(mask)
        deferred = still
        if not deferred:
            break
    for mask in deferred:  # fully isolated tiny islands keep a label
        out[mask] = next_label
        next_label += 1
    return out


def slic_np(image01: np.ndarray, n_segments: int = 500,
            compactness: float = 10.0, sigma: float = 1.0,
            max_iter: int = 10, enforce_connectivity: bool = True,
            start_label: int = 1) -> np.ndarray:
    """Canonical SLIC on an (H, W, 3) float RGB image in [0,1]."""
    H, W, _ = image01.shape
    feat = rgb2lab_np(image01)
    if sigma > 0:
        feat = np.stack([ndi.gaussian_filter(feat[..., c], sigma)
                         for c in range(3)], axis=-1)

    step = int(round(np.sqrt(H * W / n_segments)))
    cy = np.arange(step // 2, H, step)
    cx = np.arange(step // 2, W, step)
    centers = np.array([[feat[y, x, 0], feat[y, x, 1], feat[y, x, 2], y, x]
                        for y in cy for x in cx], dtype=np.float64)
    K = len(centers)

    yy, xx = np.mgrid[:H, :W].astype(np.float64)
    ratio = (compactness / step) ** 2

    labels = np.zeros((H, W), np.int64)
    for _ in range(max_iter):
        dist = np.full((H, W), np.inf)
        for k in range(K):
            L0, a0, b0, cy0, cx0 = centers[k]
            # ±S search window around the center (SLIC paper / skimage).
            y0, y1 = max(int(cy0) - step, 0), min(int(cy0) + step + 1, H)
            x0, x1 = max(int(cx0) - step, 0), min(int(cx0) + step + 1, W)
            win = feat[y0:y1, x0:x1]
            d = ((win[..., 0] - L0) ** 2 + (win[..., 1] - a0) ** 2
                 + (win[..., 2] - b0) ** 2
                 + ratio * ((yy[y0:y1, x0:x1] - cy0) ** 2
                            + (xx[y0:y1, x0:x1] - cx0) ** 2))
            closer = d < dist[y0:y1, x0:x1]
            dist[y0:y1, x0:x1][closer] = d[closer]
            labels[y0:y1, x0:x1][closer] = k
        for k in range(K):
            m = labels == k
            if m.any():
                centers[k, :3] = feat[m].mean(0)
                centers[k, 3] = yy[m].mean()
                centers[k, 4] = xx[m].mean()

    if enforce_connectivity:
        labels = _enforce_connectivity(labels, n_segments, start_label)
    elif start_label:
        labels = labels + start_label
    return labels.astype(np.int32)


# ---------------------------------------------------------------------------
# Canny (skimage.feature.canny semantics)
# ---------------------------------------------------------------------------

def canny_np(gray: np.ndarray, sigma: float = 2.0,
             low_threshold: float = 0.1, high_threshold: float = 0.2) -> np.ndarray:
    """Edges of an (H, W) float image: bleed-corrected Gaussian, Sobel,
    bilinear NMS, double threshold + hysteresis."""
    H, W = gray.shape
    ones = np.ones_like(gray)
    smoothed = ndi.gaussian_filter(gray, sigma, mode="constant")
    bleed = ndi.gaussian_filter(ones, sigma, mode="constant")
    smoothed = smoothed / (bleed + 1e-12)

    gy = ndi.sobel(smoothed, axis=0)
    gx = ndi.sobel(smoothed, axis=1)
    mag = np.hypot(gy, gx)

    # Bilinear NMS, skimage's exact 4-octant scheme: for each octant the
    # magnitude must dominate the two neighbors interpolated along ±gradient.
    eroded = np.zeros_like(gray, bool)
    eroded[1:-1, 1:-1] = True

    abs_gy, abs_gx = np.abs(gy), np.abs(gx)  # isobel / jsobel in skimage terms

    def shifted(a, dy, dx):
        out = np.zeros_like(a)
        ys = slice(max(dy, 0), H + min(dy, 0))
        xs = slice(max(dx, 0), W + min(dx, 0))
        ys_src = slice(max(-dy, 0), H + min(-dy, 0))
        xs_src = slice(max(-dx, 0), W + min(-dx, 0))
        out[ys, xs] = a[ys_src, xs_src]
        return out

    same = ((gy >= 0) & (gx >= 0)) | ((gy <= 0) & (gx <= 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        # (selector, straight neighbor, diagonal neighbor, interpolation w)
        octants = (
            (same & (abs_gy >= abs_gx), (1, 0), (1, 1), abs_gx / abs_gy),
            (same & (abs_gx >= abs_gy), (0, 1), (1, 1), abs_gy / abs_gx),
            (~same & (abs_gx >= abs_gy), (0, 1), (-1, 1), abs_gy / abs_gx),
            (~same & (abs_gy >= abs_gx), (1, 0), (-1, 1), abs_gx / abs_gy),
        )
        nms = np.zeros((H, W), bool)
        for sel, (sy, sx), (dy, dx), w in octants:
            pts = eroded & sel & (mag > 0)
            w = np.nan_to_num(w, nan=0.0, posinf=0.0)
            c_plus = (1.0 - w) * shifted(mag, -sy, -sx) + w * shifted(mag, -dy, -dx)
            c_minus = (1.0 - w) * shifted(mag, sy, sx) + w * shifted(mag, dy, dx)
            nms |= pts & (c_plus <= mag) & (c_minus <= mag)

    low_mask = nms & (mag >= low_threshold)
    high_mask = nms & (mag >= high_threshold)
    comp, n_comp = ndi.label(low_mask, structure=np.ones((3, 3)))
    if n_comp == 0:
        return np.zeros((H, W), bool)
    keep = np.zeros(n_comp + 1, bool)
    keep[np.unique(comp[high_mask])] = True
    keep[0] = False
    return keep[comp]


# ---------------------------------------------------------------------------
# Reference graph construction (train.py:89-221)
# ---------------------------------------------------------------------------

def region_adjacency_np(segments: np.ndarray) -> set:
    """8-connected label adjacency (skimage rag_mean_color connectivity=2)."""
    pairs = set()
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        a = segments[max(dy, 0):segments.shape[0] - max(-dy, 0) or None,
                     max(dx, 0):segments.shape[1] - max(-dx, 0) or None]
        b = segments[max(-dy, 0):segments.shape[0] - max(dy, 0) or None,
                     max(-dx, 0):segments.shape[1] - max(dx, 0) or None]
        diff = a != b
        for i, j in zip(a[diff].ravel(), b[diff].ravel()):
            pairs.add((min(i, j), max(i, j)))
    return pairs


def build_reference_graph(image01: np.ndarray, n_segments: int = 500,
                          segments: np.ndarray = None) -> Dict:
    """Reference create_region_graph: 15 features per non-empty region,
    compacted id_map, dense adjacency + Gaussian-product edge weights."""
    if segments is None:
        segments = slic_np(image01, n_segments=n_segments)
    H, W = segments.shape
    gray = image01[..., :3] @ GRAY_WEIGHTS
    edges_canny = canny_np(gray, sigma=2.0)

    feats = []
    id_map: Dict[int, int] = {}
    for region_id in range(segments.max() + 1):
        m = segments == region_id
        if not m.any():
            continue
        px = image01[m]
        mean_color = px.mean(0)
        std_color = px.std(0)
        gp = gray[m]
        coords = np.argwhere(m)
        perimeter = np.sum(ndi.binary_dilation(m) ^ m)
        area = m.sum()
        dil = ndi.binary_dilation(m, iterations=2)
        nb = dil & ~m
        contrast = (np.linalg.norm(mean_color - image01[nb].mean(0))
                    if nb.any() else 0.0)
        f = np.concatenate([
            mean_color, std_color, [gp.mean()], [gp.std()],
            [coords[:, 1].mean() / 256.0, coords[:, 0].mean() / 256.0],
            [len(px) / (256 * 256)],
            [(perimeter ** 2) / (4 * np.pi * area + 1e-10)],
            [contrast], [edges_canny[m].mean()], [np.var(gp)],
        ])
        id_map[region_id] = len(feats)
        feats.append(np.nan_to_num(f, nan=0.0))

    features = np.asarray(feats, np.float32)
    n = len(feats)
    adj = np.zeros((n, n), bool)
    weights = np.zeros((n, n), np.float32)
    for (i, j) in region_adjacency_np(segments):
        if i in id_map and j in id_map:
            a, b = id_map[i], id_map[j]
            color_diff = np.linalg.norm(features[a, :3] - features[b, :3])
            texture_diff = abs(features[a, 6] - features[b, 6])
            edge_diff = abs(features[a, 12] - features[b, 12])
            w = (np.exp(-color_diff / 0.15) * np.exp(-texture_diff / 0.08)
                 * np.exp(-edge_diff / 0.1))
            adj[a, b] = adj[b, a] = True
            weights[a, b] = weights[b, a] = w
    return {"features": features, "adjacency": adj, "weights": weights,
            "segments": segments, "id_map": id_map}


def node_labels_np(graph: Dict, mask01: np.ndarray, inst01: np.ndarray,
                   edge01: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-node GT labels (train.py:168-176 thresholds)."""
    seg = graph["segments"]
    y, iy, ey = [], [], []
    for region_id, _ in sorted(graph["id_map"].items(), key=lambda kv: kv[1]):
        m = seg == region_id
        y.append(1 if mask01[m].mean() > 0.5 else 0)
        iy.append(1 if inst01[m].mean() > 0.5 else 0)
        ey.append(1.0 if edge01[m].mean() > 0.3 else 0.0)
    return {"y": np.asarray(y, np.int64), "instance_y": np.asarray(iy, np.int64),
            "edge_y": np.asarray(ey, np.float32)}


# ---------------------------------------------------------------------------
# Composed inference (test.py:185-300)
# ---------------------------------------------------------------------------

def reference_heatmap(model: torch.nn.Module, graph: Dict,
                      mapping: str = "verbatim") -> np.ndarray:
    """Per-pixel camouflage-probability heatmap.

    ``mapping="verbatim"``: test.py:241-244 exactly —
    ``pred_mask[segments == region_id] = mask_probs[region_id]`` — which,
    under start_label=1 segment ids, paints each segment with its
    *successor* node's probability (reference off-by-one).
    ``mapping="corrected"``: paints via the id_map the reference builds in
    training but never applies at inference.
    """
    model.eval()
    with torch.no_grad():
        mask_out, _, _ = model(torch.tensor(graph["features"]),
                               torch.tensor(graph["adjacency"]).float(),
                               torch.tensor(graph["weights"]))
        probs = torch.softmax(mask_out, dim=1)[:, 1].numpy()
    seg = graph["segments"]
    pred = np.zeros(seg.shape, np.float64)
    if mapping == "verbatim":
        for region_id in range(seg.max() + 1):
            if region_id < len(probs):
                pred[seg == region_id] = probs[region_id]
    else:
        for region_id, node in graph["id_map"].items():
            pred[seg == region_id] = probs[node]
    return pred
