"""Golden tests for the metric suite against a direct numpy port of the
reference algorithms (/root/reference/utils/metrics.py:9-92)."""

import numpy as np
import pytest

from camouflage_multimodal_tpu.utils import (
    batch_evaluate,
    calculate_dice,
    calculate_iou,
    calculate_mae,
    calculate_precision_recall_f1,
    evaluate_segmentation,
)


def _np_reference_metrics(pred, gt, threshold=0.5):
    """Numpy implementation with the reference's exact formulas."""
    pred_binary = (pred > threshold).astype(np.float32)
    gt_binary = (gt > threshold).astype(np.float32)
    intersection = np.sum(pred_binary * gt_binary)
    union = np.sum(pred_binary) + np.sum(gt_binary) - intersection
    iou = intersection / (union + 1e-8)
    dice = (2 * intersection) / (np.sum(pred_binary) + np.sum(gt_binary) + 1e-8)
    tp = np.sum(pred_binary * gt_binary)
    fp = np.sum(pred_binary * (1 - gt_binary))
    fn = np.sum((1 - pred_binary) * gt_binary)
    precision = tp / (tp + fp + 1e-8)
    recall = tp / (tp + fn + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    mae = np.mean(np.abs(pred - gt))
    acc = np.mean((pred_binary == gt_binary))
    return dict(iou=iou, dice=dice, precision=precision, recall=recall, f1=f1,
                mae=mae, accuracy=acc)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_reference_formulas(seed):
    rng = np.random.default_rng(seed)
    pred = rng.random((64, 64)).astype(np.float32)
    gt = (rng.random((64, 64)) > 0.7).astype(np.float32)

    ref = _np_reference_metrics(pred, gt)
    got = evaluate_segmentation(pred, gt)

    for k, v in ref.items():
        assert got[k] == pytest.approx(v, rel=1e-5, abs=1e-6), k

    assert calculate_iou(pred, gt) == pytest.approx(ref["iou"], rel=1e-5)
    assert calculate_dice(pred, gt) == pytest.approx(ref["dice"], rel=1e-5)
    p, r, f1 = calculate_precision_recall_f1(pred, gt)
    assert (p, r, f1) == pytest.approx((ref["precision"], ref["recall"], ref["f1"]), rel=1e-5)
    assert calculate_mae(pred, gt) == pytest.approx(ref["mae"], rel=1e-5)


def test_batch_evaluate_mean_std():
    rng = np.random.default_rng(3)
    preds = [rng.random((32, 32)).astype(np.float32) for _ in range(5)]
    gts = [(rng.random((32, 32)) > 0.6).astype(np.float32) for _ in range(5)]
    per = [_np_reference_metrics(p, g) for p, g in zip(preds, gts)]
    got = batch_evaluate(preds, gts)
    for k in ("iou", "dice", "f1", "mae"):
        vals = np.array([m[k] for m in per])
        assert got[k] == pytest.approx(vals.mean(), rel=1e-4, abs=1e-6)
        assert got[f"{k}_std"] == pytest.approx(vals.std(), rel=1e-4, abs=1e-6)


def test_perfect_and_empty_predictions():
    gt = np.zeros((16, 16), dtype=np.float32)
    gt[4:12, 4:12] = 1.0
    m = evaluate_segmentation(gt, gt)
    assert m["iou"] == pytest.approx(1.0, abs=1e-6)
    assert m["dice"] == pytest.approx(1.0, abs=1e-6)
    assert m["mae"] == pytest.approx(0.0, abs=1e-6)
    assert m["s_measure"] > 0.9
    assert m["e_measure"] > 0.9

    empty = np.zeros_like(gt)
    m2 = evaluate_segmentation(empty, gt)
    assert m2["iou"] == pytest.approx(0.0, abs=1e-6)
    assert m2["s_measure"] < 0.6


def test_s_measure_degenerate_gt():
    pred = np.full((16, 16), 0.2, dtype=np.float32)
    gt_empty = np.zeros((16, 16), dtype=np.float32)
    m = evaluate_segmentation(pred, gt_empty)
    assert m["s_measure"] == pytest.approx(0.8, abs=1e-5)


def test_s_region_matches_numpy_centroid_split():
    """The jittable masked-quadrant S-region vs a direct numpy
    centroid-split implementation (Fan et al. semantics)."""
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.eval.metrics import _s_region

    def np_ssim(p, g):
        n = p.size
        if n <= 1:
            return 1.0
        mx, my = p.mean(), g.mean()
        sx = ((p - mx) ** 2).sum() / (n - 1)
        sy = ((g - my) ** 2).sum() / (n - 1)
        sxy = ((p - mx) * (g - my)).sum() / (n - 1)
        alpha = 4 * mx * my * sxy
        beta = (mx**2 + my**2) * (sx + sy)
        if alpha != 0:
            return alpha / (beta + 1e-8)
        return 1.0 if beta == 0 else 0.0

    def np_s_region(pred, gt):
        H, W = gt.shape
        total = gt.sum()
        if total > 0:
            yy, xx = np.mgrid[:H, :W]
            cy = int(round((yy * gt).sum() / total))
            cx = int(round((xx * gt).sum() / total))
        else:
            cy, cx = H // 2, W // 2
        score = 0.0
        for (ys, xs) in [(slice(0, cy), slice(0, cx)), (slice(0, cy), slice(cx, W)),
                         (slice(cy, H), slice(0, cx)), (slice(cy, H), slice(cx, W))]:
            p, g = pred[ys, xs], gt[ys, xs]
            w = p.size / (H * W)
            if p.size:
                score += w * np_ssim(p.astype(np.float64), g.astype(np.float64))
        return score

    rng = np.random.default_rng(0)
    for _ in range(4):
        gt = np.zeros((40, 40), np.float32)
        y0, x0 = rng.integers(2, 20, 2)
        gt[y0:y0 + rng.integers(5, 15), x0:x0 + rng.integers(5, 15)] = 1.0
        pred = np.clip(gt + rng.normal(0, 0.3, gt.shape), 0, 1).astype(np.float32)
        ref = np_s_region(pred, gt)
        got = float(_s_region(jnp.asarray(pred), jnp.asarray(gt)))
        assert got == pytest.approx(ref, abs=2e-2), (got, ref)


# ---------------------------------------------------------------------------
# Curve / adaptive E- and F-measure (eval/curves.py) vs a naive numpy sweep.
# ---------------------------------------------------------------------------

def _np_e_measure(pred_bin, gt_bin):
    n = pred_bin.size
    ap = pred_bin - pred_bin.mean()
    ag = gt_bin - gt_bin.mean()
    align = 2 * ap * ag / (ap**2 + ag**2 + 1e-8)
    em = ((align + 1) ** 2 / 4).sum() / (n - 1 + 1e-8)
    if gt_bin.sum() == 0:
        em = 1.0 - pred_bin.sum() / n
    elif gt_bin.sum() == n:
        em = pred_bin.sum() / n
    return float(em)


def _np_f_beta(pred_bin, gt_bin, beta2=0.3):
    tp = float((pred_bin * gt_bin).sum())
    prec = tp / (pred_bin.sum() + 1e-8)
    rec = tp / (gt_bin.sum() + 1e-8)
    return (1 + beta2) * prec * rec / (beta2 * prec + rec + 1e-8)


@pytest.mark.parametrize("seed", [0, 3])
def test_threshold_curves_match_naive_sweep(seed):
    from camouflage_multimodal_tpu.eval.curves import threshold_curves

    rng = np.random.default_rng(seed)
    pred = rng.random((48, 48)).astype(np.float32)
    gt = (rng.random((48, 48)) > 0.7).astype(np.float32)
    out = {k: np.asarray(v) for k, v in threshold_curves(pred, gt).items()}

    q = np.clip(np.round(pred * 255), 0, 255)
    e_naive = np.array([_np_e_measure((q >= k).astype(np.float64), gt)
                        for k in range(256)])
    f_naive = np.array([_np_f_beta((q >= k).astype(np.float64), gt)
                        for k in range(256)])
    np.testing.assert_allclose(out["e_curve"], e_naive, atol=1e-4)
    np.testing.assert_allclose(out["f_curve"], f_naive, atol=1e-4)
    assert abs(out["e_mean"] - e_naive.mean()) < 1e-4
    assert abs(out["e_max"] - e_naive.max()) < 1e-4
    assert abs(out["f_mean"] - f_naive.mean()) < 1e-4
    assert abs(out["f_max"] - f_naive.max()) < 1e-4

    t_adp = min(2 * pred.mean(), 1.0)
    k_adp = min(int(np.floor(t_adp * 255)) + 1, 255)
    assert abs(out["e_adaptive"] - e_naive[k_adp]) < 1e-4
    assert abs(out["f_adaptive"] - f_naive[k_adp]) < 1e-4


def test_threshold_curves_batched_and_degenerate():
    from camouflage_multimodal_tpu.eval.curves import (batch_curve_metrics,
                                                       threshold_curves)

    rng = np.random.default_rng(1)
    pred = rng.random((3, 32, 32)).astype(np.float32)
    gt = np.stack([
        (rng.random((32, 32)) > 0.5).astype(np.float32),
        np.zeros((32, 32), np.float32),   # empty GT
        np.ones((32, 32), np.float32),    # full GT
    ])
    out = threshold_curves(pred, gt)
    assert out["e_curve"].shape == (3, 256)
    # empty GT: E = 1 - pred_area/n; at threshold 0 the whole image is fg
    assert abs(float(out["e_curve"][1, 0]) - 0.0) < 1e-6
    # full GT: E = pred_area/n -> 1 at threshold 0
    assert abs(float(out["e_curve"][2, 0]) - 1.0) < 1e-6
    batch = batch_curve_metrics(pred, gt)
    for k in ("e_adaptive", "e_mean", "e_max", "f_adaptive", "f_mean", "f_max"):
        assert np.isfinite(float(batch[k]))


def test_iou_curve_matches_naive():
    from camouflage_multimodal_tpu.eval.curves import threshold_curves

    rng = np.random.default_rng(7)
    pred = rng.random((32, 32)).astype(np.float32)
    gt = (rng.random((32, 32)) > 0.6).astype(np.float32)
    out = threshold_curves(pred, gt)
    q = np.clip(np.round(pred * 255), 0, 255)
    ious = []
    for k in range(256):
        p = q >= k
        inter = float((p * gt).sum())
        union = float(p.sum() + gt.sum() - inter)
        ious.append(inter / (union + 1e-8))
    np.testing.assert_allclose(np.asarray(out["iou_curve"]), ious, atol=1e-4)
    assert abs(float(out["iou_max"]) - max(ious)) < 1e-4
