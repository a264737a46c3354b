"""SLIC superpixels as a fixed-shape, jittable JAX program.

TPU-native replacement for ``skimage.segmentation.slic`` (Cython) used by the
reference at ``/root/reference/models/region_graph/train.py:98`` with
``n_segments=500, compactness=10, sigma=1``.

Design (TPU-first, not a translation):

* Cluster centers live on a fixed ``gh × gw`` grid (gh·gw ≈ n_segments), so
  the per-pixel candidate set is the static 3×3 neighborhood of the pixel's
  grid cell — 9 candidates, fixed shape, no data-dependent control flow.
* Assignment is one fused elementwise pass: 9 gathered centers per pixel,
  5-D (Lab + xy) distance, argmin. The gather indices are compile-time
  constants (pixel→cell map), so XLA lowers this to cheap vectorized loads.
* The update step is a ``segment_sum`` moment accumulation over the
  assignment map — a scatter-add the TPU handles natively.
* Iteration count is static (default 10, matching skimage's max_num_iter),
  so the whole thing jits into a single XLA program and batches with vmap.

Distance: d² = ||lab_p − lab_c||² + (m/S)²·((y−cy)² + (x−cx)²) with
m = compactness and S = sqrt(H·W/K) — the canonical SLIC metric (equivalent
ordering to skimage's scaled formulation).

Output labels are raw grid-cluster ids in [0, K); empty clusters simply never
appear. The reference tolerates non-compacted ids (it skips empty regions,
``train.py:112-114``); downstream ops here are masked by pixel counts, which
subsumes that. Connectivity enforcement is intentionally not applied: every
downstream consumer (segment features, RAG, mask paint-back) is well-defined
for non-connected segments, and the fidelity gate is on final masks
(SURVEY.md §7, key decision 3).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.ops.image import gaussian_blur, rgb_to_lab


def grid_shape(n_segments: int, height: int, width: int) -> Tuple[int, int]:
    """Number of grid rows/cols of initial cluster centers (gh, gw)."""
    gh = max(1, int(round(math.sqrt(n_segments * height / width))))
    gw = max(1, int(round(n_segments / gh)))
    return gh, gw


def _init_indices(height: int, width: int, gh: int, gw: int):
    """Static pixel→cell maps and initial center positions (numpy, traced as
    constants)."""
    ys = np.arange(height)
    xs = np.arange(width)
    cell_y = np.minimum((ys * gh) // height, gh - 1)
    cell_x = np.minimum((xs * gw) // width, gw - 1)
    init_cy = (np.arange(gh) + 0.5) * height / gh
    init_cx = (np.arange(gw) + 0.5) * width / gw
    return cell_y, cell_x, init_cy, init_cx


@functools.partial(
    jax.jit,
    static_argnames=("n_segments", "compactness", "sigma", "num_iters",
                     "convert_lab", "backend"),
)
def slic(image: jnp.ndarray, n_segments: int = 500, compactness: float = 10.0,
         sigma: float = 1.0, num_iters: int = 10, convert_lab: bool = True,
         backend: str = "xla") -> jnp.ndarray:
    """Segment an (H, W, 3) float RGB image in [0,1].

    Returns an (H, W) int32 label map with values in [0, gh*gw).

    ``backend="pallas"`` runs the assignment step through the MXU distance
    kernel (ops/pallas_slic.py) instead of the 9-candidate gather — same
    candidate window, useful at larger grids.
    """
    H, W, _ = image.shape
    gh, gw = grid_shape(n_segments, H, W)
    K = gh * gw

    feat = rgb_to_lab(image) if convert_lab else image * 255.0
    if sigma > 0:
        feat = gaussian_blur(feat, sigma, mode="reflect")

    cell_y_np, cell_x_np, init_cy, init_cx = _init_indices(H, W, gh, gw)
    cell_y = jnp.asarray(cell_y_np, dtype=jnp.int32)  # (H,)
    cell_x = jnp.asarray(cell_x_np, dtype=jnp.int32)  # (W,)

    yy = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xx = jnp.ones((H, 1), jnp.float32) * jnp.arange(W, dtype=jnp.float32)[None, :]
    # Per-pixel 5-D feature: (L, a, b, y, x)
    pix = jnp.concatenate([feat, yy[..., None], xx[..., None]], axis=-1)  # (H, W, 5)

    S = math.sqrt(H * W / K)
    ratio = (compactness / S) ** 2

    # Initial centers: grid positions with the (blurred) image feature there.
    cy0 = jnp.asarray(init_cy, dtype=jnp.float32)
    cx0 = jnp.asarray(init_cx, dtype=jnp.float32)
    iy = jnp.clip(cy0.astype(jnp.int32), 0, H - 1)
    ix = jnp.clip(cx0.astype(jnp.int32), 0, W - 1)
    init_color = feat[iy][:, ix]  # (gh, gw, 3)
    centers0 = jnp.concatenate(
        [
            init_color,
            jnp.broadcast_to(cy0[:, None, None], (gh, gw, 1)),
            jnp.broadcast_to(cx0[None, :, None], (gh, gw, 1)),
        ],
        axis=-1,
    ).reshape(K, 5)

    # Static 9-candidate cluster ids per pixel (clamped 3×3 cell neighborhood).
    cand_ids = []
    valid = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny = cell_y[:, None] + dy  # (H, 1)
            nx = cell_x[None, :] + dx  # (1, W)
            ok = (ny >= 0) & (ny < gh) & (nx >= 0) & (nx < gw)
            cid = jnp.clip(ny, 0, gh - 1) * gw + jnp.clip(nx, 0, gw - 1)
            cand_ids.append(jnp.broadcast_to(cid, (H, W)))
            valid.append(jnp.broadcast_to(ok, (H, W)))
    cand_ids = jnp.stack(cand_ids, axis=-1)  # (H, W, 9) int32
    cand_valid = jnp.stack(valid, axis=-1)   # (H, W, 9) bool

    pix_flat = pix.reshape(-1, 5)
    cand_flat = cand_ids.reshape(-1, 9)
    valid_flat = cand_valid.reshape(-1, 9)

    if backend == "pallas":
        from camouflage_multimodal_tpu.ops.pallas_slic import pallas_slic_assign

        sqrt_ratio = math.sqrt(ratio)
        scale_vec = jnp.asarray([1.0, 1.0, 1.0, sqrt_ratio, sqrt_ratio], jnp.float32)
        pcell_y = jnp.repeat(cell_y, W)
        pcell_x = jnp.tile(cell_x, H)

        def assign(centers):
            return pallas_slic_assign(pix_flat * scale_vec, centers * scale_vec,
                                      pcell_y, pcell_x, gh, gw)
    else:
        def assign(centers):
            c = centers[cand_flat]                      # (HW, 9, 5)
            d = pix_flat[:, None, :] - c                # (HW, 9, 5)
            dist = (
                jnp.sum(d[..., :3] ** 2, axis=-1)
                + ratio * jnp.sum(d[..., 3:] ** 2, axis=-1)
            )
            dist = jnp.where(valid_flat, dist, jnp.inf)
            best = jnp.argmin(dist, axis=-1)            # (HW,)
            return jnp.take_along_axis(cand_flat, best[:, None], axis=-1)[:, 0]

    def update(labels, centers):
        ones = jnp.ones((pix_flat.shape[0], 1), dtype=jnp.float32)
        moments = jax.ops.segment_sum(
            jnp.concatenate([pix_flat, ones], axis=-1), labels, num_segments=K
        )
        count = moments[:, 5:6]
        new_centers = moments[:, :5] / jnp.maximum(count, 1.0)
        return jnp.where(count > 0, new_centers, centers)

    def body(_, state):
        labels, centers = state
        labels = assign(centers)
        centers = update(labels, centers)
        return labels, centers

    labels0 = assign(centers0)
    labels, _ = jax.lax.fori_loop(0, num_iters, body, (labels0, centers0))
    return labels.reshape(H, W).astype(jnp.int32)
