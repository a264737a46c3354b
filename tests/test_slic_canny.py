"""Property/behavior tests for the SLIC and Canny kernels.

skimage is not installed in this environment, so instead of pixel-exact
goldens these check the algorithmic contracts the downstream pipeline relies
on (segment counts/size distribution, boundary adherence, edge localization),
plus cross-checks against cv2 where the algorithms overlap.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.ops.canny import canny
from camouflage_multimodal_tpu.ops.slic import grid_shape, slic


def _checker(H=128, W=128, cell=32):
    yy, xx = np.mgrid[:H, :W]
    img = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    return np.stack([img, img, img], axis=-1)


def test_grid_shape_near_target():
    gh, gw = grid_shape(500, 256, 256)
    assert 450 <= gh * gw <= 550


def test_slic_segments_shape_and_range():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    gh, gw = grid_shape(64, 64, 64)

    # k-means phase: raw cluster ids, roughly all populated on random data
    raw = np.asarray(slic(jnp.asarray(img), n_segments=64,
                          enforce_connectivity=False))
    assert raw.shape == (64, 64)
    assert raw.min() >= 0 and raw.max() < gh * gw
    assert len(np.unique(raw)) > 0.8 * gh * gw

    # connectivity mode (default, skimage contract): sequential 0-based ids,
    # each a 4-connected component of size >= min_size-ish after merging
    seg = np.asarray(slic(jnp.asarray(img), n_segments=64))
    uniq = np.unique(seg)
    assert seg.min() == 0
    np.testing.assert_array_equal(uniq, np.arange(len(uniq)))
    from scipy import ndimage as ndi
    for s in uniq[:20]:
        n_comp = ndi.label(seg == s, structure=np.array(
            [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))[1]
        assert n_comp == 1, f"segment {s} is disconnected"


def test_slic_respects_strong_boundaries():
    """On a checkerboard, superpixels should not straddle the color edges:
    each segment should be (nearly) color-pure."""
    img = _checker()
    # k-means phase: perfectly color-pure on a checkerboard. (The skimage
    # connectivity pass deliberately merges tiny islands into an adjacent
    # segment regardless of color — the reference shows the same ~26%
    # impure fraction here, so purity is only a raw-phase property.)
    seg = np.asarray(slic(jnp.asarray(img), n_segments=100, compactness=10.0,
                          enforce_connectivity=False))
    gray = img[..., 0]
    impure = 0
    for s in np.unique(seg):
        vals = gray[seg == s]
        frac = vals.mean()
        if 0.05 < frac < 0.95:
            impure += vals.size
    assert impure / gray.size < 0.02, "segments straddle strong edges"


def test_slic_compactness_effect():
    """Higher compactness → more grid-like (smaller average spatial spread)."""
    rng = np.random.default_rng(1)
    img = rng.random((96, 96, 3)).astype(np.float32)

    def mean_spread(compactness):
        seg = np.asarray(slic(jnp.asarray(img), n_segments=100,
                              compactness=compactness,
                              enforce_connectivity=False))
        yy, xx = np.mgrid[: img.shape[0], : img.shape[1]]
        spreads = []
        for s in np.unique(seg):
            m = seg == s
            if m.sum() < 4:
                continue
            spreads.append(yy[m].std() + xx[m].std())
        return np.mean(spreads)

    assert mean_spread(100.0) < mean_spread(1.0)


def test_canny_detects_circle_boundary():
    H = W = 96
    yy, xx = np.mgrid[:H, :W]
    circle = ((yy - 48) ** 2 + (xx - 48) ** 2 < 30**2).astype(np.float32)
    edges = np.asarray(canny(jnp.asarray(circle), sigma=2.0))
    r = np.sqrt((yy - 48.0) ** 2 + (xx - 48.0) ** 2)
    ring = (np.abs(r - 30) < 3.0)
    # Most detected edges lie on the ring, and the ring is mostly covered.
    assert edges.sum() > 0
    assert (edges & ring).sum() / max(edges.sum(), 1) > 0.9
    ring_rows = np.unique(np.nonzero(edges)[0])
    assert len(ring_rows) > 40  # covers most of the circle vertically


def test_canny_blank_image_no_edges():
    img = np.full((32, 32), 0.5, dtype=np.float32)
    edges = np.asarray(canny(jnp.asarray(img), sigma=2.0))
    assert edges.sum() == 0


def test_canny_thin_edges():
    """NMS should produce edges ~1-2px thick across a step edge."""
    img = np.zeros((64, 64), dtype=np.float32)
    img[:, 32:] = 1.0
    edges = np.asarray(canny(jnp.asarray(img), sigma=2.0))
    per_row = edges[5:-5].sum(axis=1)
    assert (per_row >= 1).all()
    assert per_row.max() <= 2


def test_canny_agrees_with_cv2_on_real_image(sample_image_paths):
    """Loose overlap with cv2.Canny on a real COD10K image: both detectors
    should fire on a common core of strong edges (different algorithms, so
    only a weak-overlap sanity check)."""
    import cv2
    from PIL import Image

    img = Image.open(sample_image_paths[0]).convert("L").resize((256, 256))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    ours = np.asarray(canny(jnp.asarray(arr), sigma=2.0))
    theirs = cv2.Canny((arr * 255).astype(np.uint8), 50, 150) > 0
    if ours.sum() == 0 or theirs.sum() == 0:
        pytest.skip("degenerate image")
    import scipy.ndimage as ndi

    theirs_d = ndi.binary_dilation(theirs, iterations=2)
    overlap = (ours & theirs_d).sum() / ours.sum()
    assert overlap > 0.5


def test_connectivity_fixpoint_absorbs_island_chains():
    """Chained sub-min_size islands must ALL be absorbed (skimage's single
    raster pass absorbs arbitrarily long chains; the fixpoint loop matches
    that — advisor round-2 finding). Engineered map: a big background with
    a staircase chain of tiny single-pixel labels touching each other and
    only the head touching the background."""
    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity)

    H = W = 64
    labels = np.zeros((H, W), np.int32)
    # chain of 6 tiny labels along a row, each a 1x1 island
    for i in range(6):
        labels[30, 20 + i] = i + 1
    seg = np.asarray(enforce_label_connectivity(jnp.asarray(labels),
                                                n_segments=16))
    # min_size = 0.5*64*64/16 = 128 >> 1, so every island must merge away
    assert len(np.unique(seg)) == 1


def test_connectivity_max_labels_clamp_and_count():
    """Overflow survivors are clamped into the last in-bucket label and the
    pre-clamp count is reported (advisor round-2 medium finding)."""
    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity)

    H = W = 32
    # 16 large 8x8 blocks, each its own label -> 16 survivors
    yy, xx = np.mgrid[:H, :W]
    labels = ((yy // 8) * 4 + (xx // 8)).astype(np.int32)
    seg, count = enforce_label_connectivity(
        jnp.asarray(labels), n_segments=16, max_labels=10, return_count=True)
    seg = np.asarray(seg)
    assert int(count) == 16
    assert seg.max() == 9  # ids 10..15 collapsed into label 9
    # unclamped run keeps all 16
    seg_full = np.asarray(enforce_label_connectivity(jnp.asarray(labels),
                                                     n_segments=16))
    assert seg_full.max() == 15


def test_paint_segments_verbatim_mapping():
    """'verbatim' reproduces the reference's off-by-one paint-back
    (test.py:241-244): pixel of region l shows region l+1's value, last
    region paints 0."""
    from camouflage_multimodal_tpu.pipeline import paint_segments

    seg = jnp.asarray(np.array([[0, 0, 1], [2, 2, 1], [2, 2, 1]], np.int32))[None]
    vals = jnp.asarray(np.array([[0.1, 0.5, 0.9, 0.0]], np.float32))
    corrected = np.asarray(jax.jit(paint_segments)(vals, seg)[0])
    verbatim = np.asarray(jax.jit(
        lambda v, s: paint_segments(v, s, mapping="verbatim"))(vals, seg)[0])
    np.testing.assert_allclose(corrected[0, 0], 0.1)
    np.testing.assert_allclose(verbatim[0, 0], 0.5)   # region 0 shows region 1
    np.testing.assert_allclose(verbatim[0, 2], 0.9)   # region 1 shows region 2
    np.testing.assert_allclose(verbatim[1, 0], 0.0)   # last region paints 0


def test_slic_labels_stay_in_candidate_window():
    """Invariant the scatter-free blocked center update relies on (and the
    windowed-assign exactness argument, advisor round-2 low #3): every
    assigned label lies in its pixel's static 5x5 seed-cell window. Uses a
    high-contrast stripe image engineered to drift centers."""
    from camouflage_multimodal_tpu.ops.slic import grid_shape, slic_step

    H = W = 96
    yy, xx = np.mgrid[:H, :W]
    img = ((xx // 7) % 2).astype(np.float32)  # strong vertical stripes
    img = np.stack([img, (yy / H).astype(np.float32), img * 0.5], -1)
    seg = np.asarray(slic(jnp.asarray(img), n_segments=64,
                          enforce_connectivity=False))
    step = slic_step(64, H, W)
    gh, gw = grid_shape(64, H, W)
    cell_y = np.minimum(np.arange(H) // step, gh - 1)
    cell_x = np.minimum(np.arange(W) // step, gw - 1)
    dy = seg // gw - cell_y[:, None]
    dx = seg % gw - cell_x[None, :]
    assert np.abs(dy).max() <= 2 and np.abs(dx).max() <= 2, (
        "label outside the 5x5 candidate window — blocked update would "
        "drop its moment contribution")


def test_seg_min_scan_matches_naive_run_min():
    """The run-offset cummin trick (_seg_min_scan) must equal the naive
    per-run min along both axes on random label runs."""
    from camouflage_multimodal_tpu.ops.connectivity import _seg_min_scan

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, size=(17, 23)).astype(np.int32)
    comp = rng.integers(0, 17 * 23, size=(17, 23)).astype(np.int32)

    def naive(comp, labels, axis):
        out = comp.copy()
        arr_l = labels if axis == 1 else labels.T
        arr_c = comp if axis == 1 else comp.T
        res = out if axis == 1 else out.T
        for r in range(arr_l.shape[0]):
            start = 0
            row_l, row_c = arr_l[r], arr_c[r]
            for j in range(1, arr_l.shape[1] + 1):
                if j == arr_l.shape[1] or row_l[j] != row_l[start]:
                    res[r, start:j] = row_c[start:j].min()
                    start = j
        return out

    for axis in (0, 1):
        got = np.asarray(jax.jit(
            lambda c, l, a=axis: _seg_min_scan(c, l, axis=a))(
                jnp.asarray(comp), jnp.asarray(labels)))
        np.testing.assert_array_equal(got, naive(comp, labels, axis))


def test_seg_min_scan_assoc_fallback_matches():
    """The tuple-monoid associative_scan fallback (used above ~1024², where
    the run-offset trick would overflow int32) must be bit-identical to the
    run-offset path on the same inputs."""
    from camouflage_multimodal_tpu.ops.connectivity import (
        _seg_min_scan,
        _seg_min_scan_assoc,
    )

    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 5, size=(19, 31)).astype(np.int32))
    comp = jnp.asarray(rng.integers(0, 19 * 31, size=(19, 31)).astype(np.int32))
    for axis in (0, 1):
        fast = np.asarray(jax.jit(
            lambda c, l, a=axis: _seg_min_scan(c, l, axis=a))(comp, labels))
        slow = np.asarray(jax.jit(
            lambda c, l, a=axis: _seg_min_scan_assoc(c, l, axis=a))(comp, labels))
        np.testing.assert_array_equal(fast, slow)


def test_region_adjacency_drops_out_of_range_labels():
    """Labels ≥ K must DROP from the adjacency (matching the old 2-D scatter
    form), not alias into a wrong row through the pair-encoded flat index."""
    from camouflage_multimodal_tpu.ops.rag import region_adjacency

    seg = np.zeros((6, 6), np.int32)
    seg[:, 3:] = 6  # out-of-range label adjacent to label 0
    seg[4:, :3] = 1
    adj = np.asarray(region_adjacency(jnp.asarray(seg), num_segments=4))
    assert adj[0, 1] and adj[1, 0]          # real transition kept
    assert not adj.diagonal().any()
    # label 6 at K=4 would flat-encode into row 1 (0*4+6=6 → adj[1, 2])
    assert not adj[1, 2] and not adj[2, 1]
    assert adj.sum() == 2                   # nothing else appeared


def test_slic_ragged_band_shapes():
    """The blocksum center update folds clamped trailing row/col bands into
    the last seed cell; exercise shapes where H, W are NOT multiples of the
    step (and a rectangular image) and re-assert the window invariant."""
    from camouflage_multimodal_tpu.ops.slic import grid_shape, slic_step

    rng = np.random.default_rng(1)
    for H, W, n_seg in ((100, 100, 80), (96, 132, 60)):
        step = slic_step(n_seg, H, W)
        assert H % step != 0 or W % step != 0  # the case under test
        img = rng.random((H, W, 3), dtype=np.float32)
        seg = np.asarray(slic(jnp.asarray(img), n_segments=n_seg,
                              enforce_connectivity=False))
        gh, gw = grid_shape(n_seg, H, W)
        assert seg.min() >= 0 and seg.max() < gh * gw
        cell_y = np.minimum(np.arange(H) // step, gh - 1)
        cell_x = np.minimum(np.arange(W) // step, gw - 1)
        dy = seg // gw - cell_y[:, None]
        dx = seg % gw - cell_x[None, :]
        assert np.abs(dy).max() <= 2 and np.abs(dx).max() <= 2
        # non-degenerate: most clusters are used
        assert len(np.unique(seg)) > 0.7 * gh * gw
