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
* Assign AND update run in a BLOCKED layout: the image is reshaped into
  step×step seed blocks (``(n_blocks, step², ch)``), so each block's 25
  candidate centers are one tiny shared table and all 25 distances fuse
  into a single pass over a ``(n_blocks, step², 25)`` tensor. The earlier
  full-image form materialized 125 repeat-upsampled (H, W) arrays per
  iteration and measured 8× slower (30.5 → 3.8 ms/img for the 10-iteration
  loop at 352², bit-identical labels). The update's moment accumulation
  needs NO scatter: every label a pixel can hold lies in its static 5×5
  seed-cell window (see the in-function proof), so moments decompose into
  per-block one-hot einsums placed by 25 static grid shifts (the scatter
  form paid a ~2 ms per-call floor × 9 iterations).
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


def _raise_on_window_drift(ratio, radius) -> None:
    """Host-side loud failure for ``slic(..., debug_window_check=True)``."""
    worst = float(np.max(np.asarray(ratio)))
    if worst >= 1.0:
        n = 2 * int(radius) + 1
        raise RuntimeError(
            f"SLIC center drift {worst:.2f}x the safe window bound: the "
            f"{n}x{n} candidate window no longer provably covers the all-K "
            "sweep — rerun with a larger window_radius or backend='pallas' "
            "(both exact at any drift) or inspect the input.")


def window_drift_bound(step: int, radius: int = 2) -> int:
    """Max per-axis center drift from its seed under which the
    (2·radius+1)² candidate window provably covers every center a pixel's
    ±step search box can reach (so the windowed assign EQUALS the all-K
    sweep).

    Derivation (radius r): center k with seed ``seed_y = step//2 + k_i·step``
    drifted by ``d`` claims pixels ``py ∈ [floor(cy)−step, floor(cy)+step]``;
    the window covers it iff ``py//step ∈ [k_i−r, k_i+r]`` (edge clamping
    only widens the window). The binding direction is downward:
    ``floor(cy)−step ≥ (k_i−r)·step ⟸ d ≥ −((r−1)·step + step//2 − 1)``; the
    upward allowance is larger (``r·step − step//2``). Hence the symmetric
    safe bound ``(r−1)·step + step//2 − 1`` (≈1.5·step at the default r=2;
    ≈2.5·step at r=3 — 1.4× the worst drift EVER measured on COD10K,
    1.78·step, see tests/test_slic_window.py).
    """
    return (radius - 1) * step + step // 2 - 1


def slic(image: jnp.ndarray, n_segments: int = 500, compactness: float = 10.0,
         sigma: float = 1.0, num_iters: int = 10, convert_lab: bool = True,
         backend: str = "xla", enforce_connectivity: bool = True,
         max_labels: int | None = None, return_drift: bool = False,
         debug_window_check: bool = False,
         window_radius: int = 2) -> jnp.ndarray:
    """Segment an (H, W, 3) float RGB image in [0,1].

    Returns an (H, W) int32 label map: sequential raster-ordered component
    ids in [0, n_components) when ``enforce_connectivity`` (the skimage
    default the reference runs under), else raw cluster ids in [0, gh·gw).

    ``backend="pallas"`` runs the assignment step through the MXU distance
    kernel (ops/pallas_slic.py) against ALL K centers with the same box
    mask — exact by construction, no candidate-window approximation.

    The XLA path's (2·window_radius+1)² candidate window equals the all-K
    sweep only while every center stays within :func:`window_drift_bound`
    of its seed (advisor r2 #3). That assumption is CHECKED, not assumed:
    ``return_drift=True`` additionally returns the max drift ratio
    (``max_k |c_k − seed_k|_∞ / bound`` over all iterations; < 1 ⇒ the
    windowed result provably equals the all-K sweep), and
    ``debug_window_check=True`` raises host-side (``jax.debug.callback``)
    the moment any center exceeds the bound.

    Measured reality (352²+256², n_segments=500, real COD10K — pinned in
    ``tests/test_slic_window.py``): the default 5×5 window's bound is
    EXCEEDED on ~10% of images (worst ratio 1.19 ≈ 1.78·step drift), but
    the consequence is 21–46 of 65,536 pixels (≤0.07%) differing from the
    exact all-K sweep and post-connectivity node counts within ±1 — below
    the float32-vs-float64 tie noise of the skimage comparison itself.
    ``window_radius=3`` (7×7, bound 2.5·step = 1.4× the worst drift ever
    observed) makes the sweep provably exact on all measured data for
    ~+0.9 ms/img at 352²/batch-16 on the live TPU;
    ``backend="pallas"`` is exact at ANY drift but 8× slower (27.2 ms/img
    raw, its per-iteration segment_sum update pays the ~2 ms scatter floor
    ×9). THE PRODUCTION PIPELINE DEFAULTS TO 7×7 as of round 5
    (``pipeline.build_region_graphs(window_radius=3)``) with the drift
    ratio exported as telemetry (``RegionGraphBatch.window_drift``); this
    function's own default stays 5×5 for compatibility with the committed
    crossval artifacts' protocol (scripts/slic_node_crossval.py).
    Runtime note: this PJRT runtime (axon) does NOT support host callbacks,
    so the loud check is dispatched host-side here when called eagerly
    (the debug usage) and only falls back to ``jax.debug.callback`` when
    traced inside an outer jit/vmap (works on CPU; raises UNIMPLEMENTED on
    the tunneled TPU — still loud, never silent).
    """
    if (debug_window_check and backend != "pallas"
            and not isinstance(image, jax.core.Tracer)):
        labels, maxd = _slic_impl(
            image, n_segments=n_segments, compactness=compactness,
            sigma=sigma, num_iters=num_iters, convert_lab=convert_lab,
            backend=backend, enforce_connectivity=enforce_connectivity,
            max_labels=max_labels, return_drift=True,
            debug_window_check=False, window_radius=window_radius)
        _raise_on_window_drift(jax.device_get(maxd), window_radius)
        return (labels, maxd) if return_drift else labels
    return _slic_impl(
        image, n_segments=n_segments, compactness=compactness, sigma=sigma,
        num_iters=num_iters, convert_lab=convert_lab, backend=backend,
        enforce_connectivity=enforce_connectivity, max_labels=max_labels,
        return_drift=return_drift, debug_window_check=debug_window_check,
        window_radius=window_radius)


@functools.partial(
    jax.jit,
    static_argnames=("n_segments", "compactness", "sigma", "num_iters",
                     "convert_lab", "backend", "enforce_connectivity",
                     "max_labels", "return_drift", "debug_window_check",
                     "window_radius"),
)
def _slic_impl(image: jnp.ndarray, n_segments: int = 500,
               compactness: float = 10.0, sigma: float = 1.0,
               num_iters: int = 10, convert_lab: bool = True,
               backend: str = "xla", enforce_connectivity: bool = True,
               max_labels: int | None = None, return_drift: bool = False,
               debug_window_check: bool = False,
               window_radius: int = 2) -> jnp.ndarray:
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

    if backend == "pallas":
        from camouflage_multimodal_tpu.ops.pallas_slic import pallas_slic_assign

        pix_flat = pix.reshape(-1, 5)
        py_f = pix_flat[:, 3]
        px_f = pix_flat[:, 4]
        sqrt_ratio = math.sqrt(ratio)
        scale_vec = jnp.asarray([1.0, 1.0, 1.0, sqrt_ratio, sqrt_ratio],
                                jnp.float32)

        def assign(centers, prev):
            return pallas_slic_assign(pix_flat * scale_vec,
                                      centers * scale_vec,
                                      py_f.astype(jnp.int32),
                                      px_f.astype(jnp.int32),
                                      centers[:, 3], centers[:, 4],
                                      step, prev)

        # The Pallas assign sweeps ALL K centers, so a drifted center can
        # claim a pixel outside its 5×5 seed-cell window — the blocked
        # one-hot update below would silently drop such pixels. Keep the
        # scatter moment accumulation for this backend.
        def update(labels, centers):
            ones = jnp.ones((pix_flat.shape[0], 1), dtype=jnp.float32)
            moments = jax.ops.segment_sum(
                jnp.concatenate([pix_flat, ones], axis=-1), labels,
                num_segments=K)
            count = moments[:, 5:6]
            new_centers = moments[:, :5] / jnp.maximum(count, 1.0)
            return jnp.where(count > 0, new_centers, centers)

        labels0 = jnp.zeros((pix_flat.shape[0],), jnp.int32)
        unblock = lambda lab: lab.reshape(H, W)
    else:
        # BLOCKED formulation. A pixel's 25 candidate centers depend only on
        # its seed cell min(y//step, gh−1) — constant across each step×step
        # block — so reshaping the image into (n_blocks, step², ch) turns
        # the candidate lookup into ONE tiny per-block table (a (NB, 25, 5)
        # gather from the (gh+4, gw+4) padded center grid) and the 25
        # distance evaluations into a single fused elementwise pass over a
        # (NB, step², 25) tensor. The previous full-image form read each
        # candidate channel through a repeat-upsampled (H, W) map — 125
        # materialized arrays per iteration — and measured 8× slower
        # (30.5 → 3.8 ms/img for the 10-iteration loop at 352², bit-equal
        # labels; the arithmetic below keeps the same per-term order).
        nbh = -(-H // step)
        nbw = -(-W // step)
        Hp, Wp = nbh * step, nbw * step
        P = step * step
        NB = nbh * nbw

        def to_blocks(a):  # (H, W, C) zero-padded -> (NB, P, C)
            C = a.shape[-1]
            ap = jnp.pad(a, ((0, Hp - H), (0, Wp - W), (0, 0)))
            return (ap.reshape(nbh, step, nbw, step, C)
                    .transpose(0, 2, 1, 3, 4).reshape(NB, P, C))

        pix_b = to_blocks(pix)                                    # (NB, P, 5)
        # 6th channel = validity/count: zero at geometric pad pixels so they
        # contribute nothing to the center moments (their labels are junk
        # but are cropped before return and weighted 0 in the update).
        pix6_b = jnp.concatenate(
            [pix_b, to_blocks(jnp.ones((H, W, 1), jnp.float32))], -1)

        # Static per-block candidate tables, ascending (dy, dx) order =
        # ascending cluster id (skimage's first-wins tie-breaking).
        rad = int(window_radius)
        if rad < 2:
            raise ValueError("window_radius must be >= 2 (the one-hot "
                             "update's own-window membership proof needs "
                             "the pixel's seed cell plus one ring)")
        span = range(-rad, rad + 1)
        offsets = [(dy, dx) for dy in span for dx in span]
        NW = len(offsets)                               # (2·rad+1)²
        ci = np.minimum(np.arange(nbh), gh - 1)
        cj = np.minimum(np.arange(nbw), gw - 1)
        dys = np.array([o[0] for o in offsets])
        dxs = np.array([o[1] for o in offsets])
        iy = ci[:, None] + dys[None, :]                 # (nbh, NW)
        jx = cj[:, None] + dxs[None, :]                 # (nbw, NW)
        in_grid_np = ((iy[:, None, :] >= 0) & (iy[:, None, :] < gh)
                      & (jx[None, :, :] >= 0) & (jx[None, :, :] < gw))
        iyc = np.clip(iy, 0, gh - 1)
        jxc = np.clip(jx, 0, gw - 1)
        # out-of-grid slots read a clamped (in-grid) center from gpad but
        # are masked by in_grid; id −1 never matches a label in the update.
        cand_id = jnp.asarray(
            np.where(in_grid_np, iyc[:, None, :] * gw + jxc[None, :, :],
                     -1).reshape(NB, NW), jnp.int32)
        gpad_idx = jnp.asarray(
            ((iyc + rad)[:, None, :] * (gw + 2 * rad)
             + (jxc + rad)[None, :, :]).reshape(NB, NW), jnp.int32)
        in_grid = jnp.asarray(in_grid_np.reshape(NB, NW))

        pix_ch = [pix_b[..., c] for c in range(5)]
        py, px = pix_ch[3], pix_ch[4]                             # (NB, P)
        BIGID = jnp.int32(K)
        INF = jnp.float32(np.inf)

        def assign(centers, prev):
            g = centers.reshape(gh, gw, 5)
            gpad = jnp.pad(g, ((rad, rad), (rad, rad), (0, 0))).reshape(-1, 5)
            cc = gpad[gpad_idx]                                  # (NB, NW, 5)
            cy, cx = cc[..., 3], cc[..., 4]
            dist = ratio * ((py[..., None] - cy[:, None, :]) ** 2
                            + (px[..., None] - cx[:, None, :]) ** 2)
            for c in range(3):
                dist = dist + (pix_ch[c][..., None] - cc[:, None, :, c]) ** 2
            # skimage's ±step search box around the CURRENT center
            # (train-side windows: reference_pipeline.slic_np:156-158).
            valid = (in_grid[:, None, :]
                     & (jnp.abs(py[..., None] - jnp.floor(cy[:, None, :]))
                        <= step)
                     & (jnp.abs(px[..., None] - jnp.floor(cx[:, None, :]))
                        <= step))
            dist = jnp.where(valid, dist, INF)
            best = jnp.min(dist, axis=-1)                        # (NB, P)
            # min id among the minima == first minimum in ascending-id order.
            lab = jnp.min(jnp.where(dist == best[..., None],
                                    cand_id[:, None, :], BIGID), axis=-1)
            # a pixel covered by no box keeps its previous label (skimage
            # leaves `labels` untouched where no window visits)
            return jnp.where(best < INF, lab, prev)

        # Center update WITHOUT the per-iteration scatter (scatter calls pay
        # a ~2 ms per-call floor on this TPU). Every label a pixel can hold
        # lies inside its OWN static 5×5 candidate window — at iteration 1
        # the pixel's own seed box always covers it (|p − seed| ≤ step − 1
        # per axis by the seed-grid construction, including clamped edge
        # cells), and the no-box fallback keeps the previous in-window
        # label, so membership holds inductively. Hence the moments
        # decompose per seed block as one-hot einsums placed by 25 static
        # grid shifts — all regular ops, zero scatters. einsum precision
        # must be HIGHEST: the TPU matmul default is bf16-grade and the
        # moment sums reach ~10⁴ (CLAUDE.md numerical-parity trap).
        def update(labels, centers):
            oh = (labels[..., None] == cand_id[:, None, :]).astype(jnp.float32)
            mom_bo = jnp.einsum("bpo,bpc->boc", oh, pix6_b,
                                precision=jax.lax.Precision.HIGHEST)
            mb = mom_bo.reshape(nbh, nbw, NW, 6)
            if nbh > gh:  # clamped trailing bands fold into the last cell row
                mb = mb.at[gh - 1].add(mb[gh:].sum(0))[:gh]
            if nbw > gw:
                mb = mb.at[:, gw - 1].add(mb[:, gw:].sum(1))[:, :gw]
            # Offset o = (dy, dx) of block (i, j) feeds center (i+dy, j+dx):
            # NW static shifted adds on the tiny (gh, gw, 6) grid.
            mom = jnp.zeros((gh + 2 * rad, gw + 2 * rad, 6), jnp.float32)
            for o, (dy, dx) in enumerate(offsets):
                mom = mom.at[rad + dy:rad + dy + gh,
                             rad + dx:rad + dx + gw].add(mb[:, :, o])
            mom = mom[rad:rad + gh, rad:rad + gw].reshape(K, 6)
            count = mom[:, 5:6]
            new_centers = mom[:, :5] / jnp.maximum(count, 1.0)
            return jnp.where(count > 0, new_centers, centers)

        labels0 = jnp.zeros((NB, P), jnp.int32)

        def unblock(lab):
            return (lab.reshape(nbh, nbw, step, step)
                    .transpose(0, 2, 1, 3).reshape(Hp, Wp)[:H, :W])

    # Window-validity telemetry: max L∞ drift of any center from its seed,
    # over every center state an assign ever sees, as a fraction of the
    # provable safe bound for THIS window radius. < 1 ⇒ the windowed assign
    # equals the all-K sweep. K-sized vector work per iteration — noise
    # next to the assign.
    seed_pos = centers0[:, 3:5]
    # step == 1 (n_segments ≳ H·W/2.25) makes the provable bound 0 at the
    # default radius: ANY drift then exceeds it, so report the raw drift
    # against a floor of 1 px instead of dividing by zero at trace time
    # (advisor r4) — ratio ≥ 1 still means "window not provably exact".
    inv_bound = 1.0 / float(max(1, window_drift_bound(step, window_radius)))

    def drift_ratio(centers):
        return jnp.max(jnp.abs(centers[:, 3:5] - seed_pos)) * inv_bound

    def body(_, state):
        labels, centers, maxd = state
        labels = assign(centers, labels)
        centers = update(labels, centers)
        return labels, centers, jnp.maximum(maxd, drift_ratio(centers))

    # num_iters-1 full (assign, update) rounds + one final assign: the last
    # round's center update feeds nothing (labels are the output). Labels
    # are identical by construction.
    if num_iters > 0:
        labels, centers, maxd = jax.lax.fori_loop(
            0, num_iters - 1, body, (labels0, centers0, jnp.float32(0.0)))
        labels = assign(centers, labels)
    else:
        labels = labels0
        maxd = jnp.float32(0.0)
    labels = unblock(labels).astype(jnp.int32)

    if debug_window_check and backend != "pallas":
        # The Pallas assign sweeps all K centers — exact at any drift, so
        # the loud check only guards the windowed XLA path.
        jax.debug.callback(_raise_on_window_drift, maxd, window_radius)

    if enforce_connectivity:
        from camouflage_multimodal_tpu.ops.connectivity import (
            enforce_label_connectivity)

        labels = enforce_label_connectivity(labels, n_segments,
                                            max_labels=max_labels)
    if return_drift:
        return labels, maxd
    return labels
