"""SLIC superpixels as a fixed-shape, jittable JAX program.

TPU-native replacement for ``skimage.segmentation.slic`` (Cython) used by the
reference at ``/root/reference/models/region_graph/train.py:98`` with
``n_segments=500, compactness=10, sigma=1`` (skimage defaults:
``max_num_iter=10, enforce_connectivity=True, start_label=1``).

Design (TPU-first, not a translation) — matches skimage's observable
contract exactly, pixel for pixel up to float32-vs-float64 boundary ties:

* Seeds on skimage's step grid: ``step = round(sqrt(H·W/K))``, seeds at
  ``step//2 + i·step`` — NOT a rounded gh×gw factorization (which produced a
  different superpixel lattice and was the dominant fidelity gap in r1).
* Assignment applies skimage's ±step search-box constraint around the
  CURRENT center position: center k may claim pixel p only if
  ``|p − floor(c_k)| ≤ step`` per axis. The candidate set is the static 5×5
  neighborhood of the pixel's seed cell — a superset of every center whose
  box can reach the pixel while centers drift < 1.5·step (they stay inside
  their region in practice) — masked by the box test, so the result equals
  the all-K sweep. Candidates are ordered by ascending cluster id, matching
  skimage's first-wins tie-breaking under its strict-< update loop.
* The update step needs NO scatter: every label a pixel can hold lies in
  its static 5×5 seed-cell window (see the in-function proof), so the
  moment accumulation decomposes into per-seed-block sums placed by 25
  static grid shifts — band-reshaped einsum + reshape-sums, all regular
  ops (the scatter form paid a ~2 ms per-call floor × 9 iterations).
* Iteration count is static (10 = skimage's max_num_iter), so the whole
  thing jits into a single XLA program and batches with vmap.
* ``enforce_connectivity=True`` routes through
  :mod:`camouflage_multimodal_tpu.ops.connectivity` (CC split + min-size
  merge + raster-rank relabel, all on device). Labels come back 0-based and
  sequential; the reference's ``start_label=1`` shift is an id permutation
  the (permutation-equivariant) downstream graph never observes.

Distance: d² = ||lab_p − lab_c||² + (m/step)²·((y−cy)² + (x−cx)²), skimage's
scaled formulation.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.ops.image import gaussian_blur, rgb_to_lab


def slic_step(n_segments: int, height: int, width: int) -> int:
    """skimage's seed spacing."""
    return max(1, int(round(math.sqrt(height * width / n_segments))))


def grid_shape(n_segments: int, height: int, width: int) -> Tuple[int, int]:
    """Rows/cols of the seed grid (gh, gw); K = gh·gw clusters."""
    step = slic_step(n_segments, height, width)
    gh = len(range(step // 2, height, step))
    gw = len(range(step // 2, width, step))
    return gh, gw


@functools.partial(
    jax.jit,
    static_argnames=("n_segments", "compactness", "sigma", "num_iters",
                     "convert_lab", "backend", "enforce_connectivity",
                     "max_labels"),
)
def slic(image: jnp.ndarray, n_segments: int = 500, compactness: float = 10.0,
         sigma: float = 1.0, num_iters: int = 10, convert_lab: bool = True,
         backend: str = "xla", enforce_connectivity: bool = True,
         max_labels: int | None = None) -> jnp.ndarray:
    """Segment an (H, W, 3) float RGB image in [0,1].

    Returns an (H, W) int32 label map: sequential raster-ordered component
    ids in [0, n_components) when ``enforce_connectivity`` (the skimage
    default the reference runs under), else raw cluster ids in [0, gh·gw).

    ``backend="pallas"`` runs the assignment step through the MXU distance
    kernel (ops/pallas_slic.py) against ALL K centers with the same box
    mask — exact by construction, no candidate-window approximation.
    """
    H, W, _ = image.shape
    step = slic_step(n_segments, H, W)
    sy = np.arange(step // 2, H, step)
    sx = np.arange(step // 2, W, step)
    gh, gw = len(sy), len(sx)
    K = gh * gw

    feat = rgb_to_lab(image) if convert_lab else image * 255.0
    if sigma > 0:
        feat = gaussian_blur(feat, sigma, mode="reflect")

    yy = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xx = jnp.ones((H, 1), jnp.float32) * jnp.arange(W, dtype=jnp.float32)[None, :]
    # Per-pixel 5-D feature: (L, a, b, y, x)
    pix = jnp.concatenate([feat, yy[..., None], xx[..., None]], axis=-1)  # (H, W, 5)

    ratio = (compactness / step) ** 2

    # Initial centers: seed-pixel features at the exact integer seed grid.
    init_color = feat[jnp.asarray(sy)][:, jnp.asarray(sx)]  # (gh, gw, 3)
    syf = jnp.asarray(sy, jnp.float32)
    sxf = jnp.asarray(sx, jnp.float32)
    centers0 = jnp.concatenate(
        [
            init_color,
            jnp.broadcast_to(syf[:, None, None], (gh, gw, 1)),
            jnp.broadcast_to(sxf[None, :, None], (gh, gw, 1)),
        ],
        axis=-1,
    ).reshape(K, 5)

    # Pixel's seed cell (for the static candidate window).
    cell_y_np = np.minimum(np.arange(H) // step, gh - 1)
    cell_x_np = np.minimum(np.arange(W) // step, gw - 1)
    cell_y = jnp.asarray(cell_y_np, jnp.int32)
    cell_x = jnp.asarray(cell_x_np, jnp.int32)

    # Static 25-candidate cluster ids per pixel (5×5 cell neighborhood),
    # ascending id order within each pixel's list (skimage tie-breaking).
    cand_ids, in_grid = [], []
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            ny = cell_y[:, None] + dy  # (H, 1)
            nx = cell_x[None, :] + dx  # (1, W)
            ok = (ny >= 0) & (ny < gh) & (nx >= 0) & (nx < gw)
            cid = jnp.clip(ny, 0, gh - 1) * gw + jnp.clip(nx, 0, gw - 1)
            cand_ids.append(jnp.broadcast_to(cid, (H, W)))
            in_grid.append(jnp.broadcast_to(ok, (H, W)))
    cand_flat = jnp.stack(cand_ids, axis=-1).reshape(-1, 25)
    grid_flat = jnp.stack(in_grid, axis=-1).reshape(-1, 25)

    pix_flat = pix.reshape(-1, 5)
    py = pix_flat[:, 3]
    px = pix_flat[:, 4]

    if backend == "pallas":
        from camouflage_multimodal_tpu.ops.pallas_slic import pallas_slic_assign

        sqrt_ratio = math.sqrt(ratio)
        scale_vec = jnp.asarray([1.0, 1.0, 1.0, sqrt_ratio, sqrt_ratio],
                                jnp.float32)

        def assign(centers, prev):
            return pallas_slic_assign(pix_flat * scale_vec,
                                      centers * scale_vec,
                                      py.astype(jnp.int32),
                                      px.astype(jnp.int32),
                                      centers[:, 3], centers[:, 4],
                                      step, prev)
    else:
        # A pixel's candidate center for offset (dy, dx) is
        # centers_grid[cell_y + dy, cell_x + dx], and cell_y/cell_x are the
        # STATIC maps min(y//step, gh-1) — so the lookup is a shifted grid
        # upsampled by `step` (repeat + edge-pad): pure broadcasts, ZERO
        # runtime gathers. Dynamic gathers are the slowest primitive on
        # this TPU (~15 ms per 16×256² sweep); this formulation cut the
        # 10-iteration assign loop ~4×.
        def _up_rows(g):
            r = jnp.repeat(g, step, axis=0)
            if r.shape[0] < H:
                r = jnp.concatenate(
                    [r, jnp.broadcast_to(r[-1:], (H - r.shape[0], r.shape[1]))])
            return r[:H]

        def _up_cols(g):
            c = jnp.repeat(g, step, axis=1)
            if c.shape[1] < W:
                c = jnp.concatenate(
                    [c, jnp.broadcast_to(c[:, -1:], (c.shape[0], W - c.shape[1]))],
                    axis=1)
            return c[:, :W]

        def _upsample(g):
            return _up_cols(_up_rows(g))

        offsets = [(dy, dx) for dy in (-2, -1, 0, 1, 2)
                   for dx in (-2, -1, 0, 1, 2)]
        pix_ch2d = [pix[..., c] for c in range(5)]
        py2d, px2d = pix_ch2d[3], pix_ch2d[4]
        cand_maps = cand_flat.reshape(H, W, len(offsets))
        valid_maps = grid_flat.reshape(H, W, len(offsets))

        def assign(centers, prev):
            # Running min over the 25 candidates (unrolled); strict `<`
            # with the ascending-id offset order reproduces argmin's
            # first-minimum tie-breaking.
            g = centers.reshape(gh, gw, 5)
            gpad = jnp.pad(g, ((2, 2), (2, 2), (0, 0)))
            best_dist = jnp.full((H, W), jnp.inf, jnp.float32)
            best_id = prev.reshape(H, W)
            found = jnp.zeros((H, W), bool)
            for i, (dy, dx) in enumerate(offsets):
                sub = gpad[2 + dy: 2 + dy + gh, 2 + dx: 2 + dx + gw]
                ch = [_upsample(sub[..., c]) for c in range(5)]
                dist = ratio * ((py2d - ch[3]) ** 2 + (px2d - ch[4]) ** 2)
                for c in range(3):
                    dist = dist + (pix_ch2d[c] - ch[c]) ** 2
                # skimage's ±step search box around the CURRENT center
                # (train-side windows: reference_pipeline.slic_np:156-158).
                valid = (valid_maps[..., i]
                         & (jnp.abs(py2d - jnp.floor(ch[3])) <= step)
                         & (jnp.abs(px2d - jnp.floor(ch[4])) <= step))
                better = valid & (dist < best_dist)
                best_dist = jnp.where(better, dist, best_dist)
                best_id = jnp.where(better, cand_maps[..., i], best_id)
                found = found | valid
            # a pixel covered by no box keeps its previous label (skimage
            # leaves `labels` untouched where no window visits)
            return jnp.where(found, best_id,
                             prev.reshape(H, W)).reshape(-1)

    if backend == "pallas":
        # The Pallas assign sweeps ALL K centers, so a drifted center can
        # claim a pixel outside its 5×5 seed-cell window — the blocksum
        # update below would silently drop such pixels. Keep the scatter
        # moment accumulation for this backend.
        def update(labels, centers):
            ones = jnp.ones((pix_flat.shape[0], 1), dtype=jnp.float32)
            moments = jax.ops.segment_sum(
                jnp.concatenate([pix_flat, ones], axis=-1), labels,
                num_segments=K)
            count = moments[:, 5:6]
            new_centers = moments[:, :5] / jnp.maximum(count, 1.0)
            return jnp.where(count > 0, new_centers, centers)
    else:
        # Center update WITHOUT the per-iteration scatter. The natural form
        # is a 6-channel segment_sum moment accumulation, but scatter calls
        # on this TPU have a ~2 ms per-call floor that made the 9 update
        # scatters ~3/4 of the whole SLIC loop. The key fact: every label a
        # pixel can hold lies inside its OWN static 5×5 candidate window —
        # at iteration 1 the pixel's own seed box always covers it
        # (|p − seed| ≤ step − 1 per axis by the seed-grid construction,
        # including clamped edge cells), and the no-box fallback keeps the
        # previous in-window label, so membership holds inductively. Hence
        # each pixel has a unique valid window slot o with
        # cand_id(o) == label, and the moments decompose per seed block as
        #   moments[cell + off(o)] = Σ_o shift_o(blocksum(pix6 · 1[o]))
        # — a band-reshaped einsum (row bands) + reshape-sum (col bands) +
        # 25 static grid-shift adds: all regular ops, zero scatters.
        # Earlier blocked attempts (25 offset-masked full-image reduces;
        # a materialized (H, W, 25, 6) product) measured SLOWER than the
        # scatter; contracting the band axis straight out via dot_general
        # never materializes the product. einsum precision must be HIGHEST:
        # the TPU matmul default is bf16-grade and the moment sums reach
        # ~10⁴ (CLAUDE.md numerical-parity trap).
        nbh = -(-H // step)   # uniform step-row bands after zero-padding
        nbw = -(-W // step)
        Hp, Wp = nbh * step, nbw * step
        cand_hw = cand_flat.reshape(H, W, 25)
        valid_hw = grid_flat.reshape(H, W, 25)
        pix6p = jnp.pad(
            jnp.concatenate([pix, jnp.ones((H, W, 1), jnp.float32)], -1),
            ((0, Hp - H), (0, 0), (0, 0)))

        def update(labels, centers):
            lab2 = labels.reshape(H, W)
            oh = ((lab2[..., None] == cand_hw) & valid_hw).astype(jnp.float32)
            ohp = jnp.pad(oh, ((0, Hp - H), (0, 0), (0, 0)))
            b1 = jnp.einsum(
                "nswo,nswc->nwoc",
                ohp.reshape(nbh, step, W, 25),
                pix6p.reshape(nbh, step, W, 6),
                precision=jax.lax.Precision.HIGHEST)
            if nbh > gh:  # clamped trailing band folds into the last cell row
                b1 = b1.at[gh - 1].add(b1[gh])[:gh]
            b1 = jnp.pad(b1, ((0, 0), (0, Wp - W), (0, 0), (0, 0)))
            b2 = b1.reshape(gh, nbw, step, 25, 6).sum(2)
            if nbw > gw:
                b2 = b2.at[:, gw - 1].add(b2[:, gw])[:, :gw]
            # Offset o = (dy, dx) of block (i, j) feeds center (i+dy, j+dx):
            # 25 static shifted adds on the tiny (gh, gw, 6) grid.
            mom = jnp.zeros((gh + 4, gw + 4, 6), jnp.float32)
            for o, (dy, dx) in enumerate(offsets):
                mom = mom.at[2 + dy:2 + dy + gh, 2 + dx:2 + dx + gw].add(
                    b2[:, :, o])
            mom = mom[2:2 + gh, 2:2 + gw].reshape(K, 6)
            count = mom[:, 5:6]
            new_centers = mom[:, :5] / jnp.maximum(count, 1.0)
            return jnp.where(count > 0, new_centers, centers)

    def body(_, state):
        labels, centers = state
        labels = assign(centers, labels)
        centers = update(labels, centers)
        return labels, centers

    labels0 = jnp.zeros((pix_flat.shape[0],), jnp.int32)
    # num_iters-1 full (assign, update) rounds + one final assign: the last
    # round's center update feeds nothing (labels are the output), and the
    # update segment_sum is the costliest op in the loop (~2.3 ms/image at
    # 352² — the TPU scatter floor). Labels are identical by construction.
    if num_iters > 0:
        labels, centers = jax.lax.fori_loop(0, num_iters - 1, body,
                                            (labels0, centers0))
        labels = assign(centers, labels)
    else:
        labels = labels0
    labels = labels.reshape(H, W).astype(jnp.int32)

    if enforce_connectivity:
        from camouflage_multimodal_tpu.ops.connectivity import (
            enforce_label_connectivity)

        labels = enforce_label_connectivity(labels, n_segments,
                                            max_labels=max_labels)
    return labels
