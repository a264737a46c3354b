"""Smoke tests for the visualization surfaces (figures written to disk)."""

import os

import numpy as np


def test_reference_utils_visualization(tmp_path, rng):
    from camouflage_multimodal_tpu.utils import (
        plot_attention_heatmap,
        plot_comparison,
        plot_metrics_summary,
        plot_training_history,
    )

    history = {"train_loss": [1.0, 0.8], "val_loss": [1.1, 0.9],
               "train_acc": [50, 60], "val_acc": [48, 55]}
    plot_training_history(history, str(tmp_path / "hist.png"))

    attn = rng.random((30, 13))
    plot_attention_heatmap(attn, [f"cat{i}" for i in range(13)],
                           str(tmp_path / "attn.png"))

    img = rng.random((32, 32, 3))
    pred = rng.random((32, 32))
    gt = (rng.random((32, 32)) > 0.5).astype(float)
    plot_comparison(img, pred, gt, str(tmp_path / "cmp.png"))

    plot_metrics_summary({"iou": 0.7, "dice": 0.85, "mae": 0.1},
                         str(tmp_path / "metrics.png"))

    for f in ("hist.png", "attn.png", "cmp.png", "metrics.png"):
        assert os.path.getsize(tmp_path / f) > 1000


def test_panels(tmp_path, rng):
    from camouflage_multimodal_tpu.viz import detection_panel, multimodal_panel

    img = rng.random((64, 64, 3))
    seg = rng.integers(0, 50, (64, 64))
    heat = rng.random((64, 64))
    detection_panel(img, seg, heat, "HIGHLY CAMOUFLAGED", "red", 0.4, 12.0,
                    str(tmp_path / "det.png"), "x.jpg")
    assert os.path.getsize(tmp_path / "det.png") > 1000

    predictions = {
        "segments": seg, "mask_prob": np.array([0.3, 0.7]), "mask_pred": 1,
        "instance_pred": 0, "score": 0.42,
    }
    attn = {"rg2kg": rng.random((50, 13))}
    kg_cats = {f"cat{i}": None for i in range(13)}
    multimodal_panel(img, predictions, attn, kg_cats,
                     str(tmp_path / "mm.png"), "x.jpg")
    assert os.path.getsize(tmp_path / "mm.png") > 1000
