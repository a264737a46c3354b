#!/usr/bin/env python
"""Quality-parity anchor (VERDICT r1 item 2).

The reference published NO accuracy numbers (BASELINE.md), so "quality
parity" needs an anchor measured here: train the reference's own torch model
with its own recipe (scripts/fidelity_gate.py --stage train) and this repo's
RGTrainer on the SAME 120-image split, then evaluate BOTH composed pipelines
on the SAME 50 held-out images with the same on-device metrics.

Rows produced (artifacts/quality_table.json):
  reference_torch_trained — reference recipe + reference-side composed
      executor (iou from artifacts/fidelity_report.json, identical weights
      transplanted through the JAX pipeline measured here too)
  jax_trained            — this repo's RGTrainer on the same train images

Usage:
  python scripts/quality_anchor.py --stage train   # JAX training run
  python scripts/quality_anchor.py --stage eval    # both rows + table
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

from fidelity_gate import OUT_DIR, REF_DATA, quadruples  # noqa: E402

def _ckpt(size: int) -> str:
    return ("artifacts/quality/rg_jax_anchor.ckpt" if size == 256
            else f"artifacts/quality/rg_jax_anchor_{size}.ckpt")


def _filtered_dataset(names, image_size=256):
    from camouflage_multimodal_tpu.data.cod10k import CODDataset

    ds = CODDataset(os.path.join(REF_DATA, "images"),
                    os.path.join(REF_DATA, "gt_object"),
                    os.path.join(REF_DATA, "gt_instance"),
                    os.path.join(REF_DATA, "gt_edge"),
                    image_size=image_size)
    want = {base for base, *_ in names}
    ds.samples = [s for s in ds.samples
                  if os.path.splitext(s.image_name)[0] in want]
    assert len(ds.samples) == len(names), (len(ds.samples), len(names))
    return ds


def stage_train(train_names, epochs=30, batch_size=4, size=256):
    from camouflage_multimodal_tpu.pipeline import padded_nodes
    from camouflage_multimodal_tpu.train.train_rg import RGTrainer

    ckpt = _ckpt(size)
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    ds = _filtered_dataset(train_names, image_size=size)
    trainer = RGTrainer(n_segments=500, max_nodes=padded_nodes(500, size))
    state, history = trainer.fit(ds, epochs=epochs, batch_size=batch_size,
                                 checkpoint_path=ckpt)
    hist = ("artifacts/quality/rg_jax_anchor_history.json" if size == 256
            else f"artifacts/quality/rg_jax_anchor_history_{size}.json")
    with open(hist, "w") as f:
        json.dump(history, f, indent=2)


def _eval_split(ckpt, test_names, size=256, feature_norm=None):
    """Composed-pipeline metrics on exactly the held-out images.

    ``feature_norm=256`` for reference-recipe torch weights at non-256
    sizes (they were trained on /256-normalized positional features —
    ops/regions.py docstring)."""
    import tempfile

    from camouflage_multimodal_tpu.api import evaluate_directory

    tmp = tempfile.mkdtemp(prefix="quality_eval_")
    img_dir = os.path.join(tmp, "images")
    gt_dir = os.path.join(tmp, "gt")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    for base, img_p, mask_p, *_ in test_names:
        os.symlink(img_p, os.path.join(img_dir, base + ".jpg"))
        os.symlink(mask_p, os.path.join(gt_dir, base + ".png"))
    return evaluate_directory(ckpt, img_dir, gt_dir, batch_size=10,
                              image_size=size, feature_norm=feature_norm)


def stage_eval(test_names, size=256):
    rows = {}
    ref_ckpt = os.path.join(
        OUT_DIR, "best_model.pth" if size == 256 else f"best_model_{size}.pth")
    if os.path.exists(ref_ckpt):
        rows["reference_torch_trained_weights_in_jax_pipeline"] = _eval_split(
            ref_ckpt, test_names, size=size,
            feature_norm=256)  # reference recipe trains on /256 features
    ckpt = _ckpt(size)
    if os.path.exists(ckpt):
        rows["jax_trained"] = _eval_split(ckpt, test_names, size=size)
    report = ("artifacts/fidelity_report.json" if size == 256
              else f"artifacts/fidelity_report_{size}.json")
    if os.path.exists(report):
        with open(report) as f:
            fr = json.load(f)
        rows["reference_composed_pipeline_iou"] = (
            fr.get("iou_vs_gt", fr.get("iou_vs_gt_cam_only", {})) or {}).get("ref")

    table = {
        "image_size": size,
        "n_held_out": len(test_names),
        "protocol": "composed image→heatmap pipeline, binarized at 0.5, "
                    "on-device IoU/Dice/F1/MAE/S/E over the 50 fidelity "
                    "held-out images; both models trained on the same "
                    "120-image split (reference: its own recipe "
                    "train.py:315-468; jax: RGTrainer same losses/schedule)",
        "rows": rows,
    }
    out = ("artifacts/quality_table.json" if size == 256
           else f"artifacts/quality_table_{size}.json")
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["all", "train", "eval"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=120)
    ap.add_argument("--n-test", type=int, default=50)
    ap.add_argument("--size", type=int, default=256,
                    help="image resolution; non-256 rows land in "
                         "quality_table_<size>.json (VERDICT r4 item 6: "
                         "separate '352 is harder' from 'the 352 pipeline "
                         "hurts learning')")
    args = ap.parse_args()

    train_s, test_s = quadruples(args.n_train, args.n_test)
    if args.stage in ("all", "train"):
        stage_train(train_s, epochs=args.epochs, size=args.size)
    if args.stage in ("all", "eval"):
        stage_eval(test_s, size=args.size)


if __name__ == "__main__":
    main()
