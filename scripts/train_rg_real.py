"""Train the region-graph GNN on real COD10K data end-to-end on the TPU.

Produces artifacts/rg_model.ckpt + a metrics report over a held-out split —
the real counterpart of the reference's `python models/region_graph/train.py`
run, exercising the full device pipeline (SLIC→features→RAG→GNN→multi-task
loss) with cached graph building.

Usage: python scripts/train_rg_real.py [--images N] [--epochs E]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=256)
    parser.add_argument("--eval-images", type=int, default=256)
    parser.add_argument("--eval-stride", type=int, default=0,
                        help="If >0, hold out every Nth image (interleaved "
                        "split spanning all COD10K categories) instead of "
                        "the head/tail split; --images then caps the train "
                        "side and --eval-images the held-out side.")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--n-segments", type=int, default=500)
    parser.add_argument("--data-root", default="/root/reference/data/COD10K")
    parser.add_argument("--out", default="artifacts")
    args = parser.parse_args()

    import jax

    from camouflage_multimodal_tpu.api import evaluate_directory
    from camouflage_multimodal_tpu.data.cod10k import CODDataset
    from camouflage_multimodal_tpu.pipeline import padded_nodes
    from camouflage_multimodal_tpu.train.train_rg import RGTrainer

    os.makedirs(args.out, exist_ok=True)

    ds_full = CODDataset(
        os.path.join(args.data_root, "images"),
        os.path.join(args.data_root, "gt_object"),
        os.path.join(args.data_root, "gt_instance"),
        os.path.join(args.data_root, "gt_edge"),
        image_size=args.image_size,
    )
    held_out = []
    if args.eval_stride > 0:
        all_samples = ds_full.samples
        held_out = all_samples[:: args.eval_stride][: args.eval_images]
        held_names = {s.image_name for s in held_out}
        ds_full.samples = [s for s in all_samples
                           if s.image_name not in held_names][: args.images]
    else:
        ds_full.samples = ds_full.samples[: args.images]
    print(f"dataset: {len(ds_full)} quadruples  backend={jax.default_backend()}"
          + (f"  (+{len(held_out)} interleaved held-out)" if held_out else ""))

    max_nodes = padded_nodes(args.n_segments, args.image_size)
    trainer = RGTrainer(n_segments=args.n_segments, max_nodes=max_nodes,
                        learning_rate=1e-3, weight_decay=1e-4)

    import jax.numpy as jnp

    # bf16 edge-weight storage halves the dominant HBM buffer for large runs
    weights_dtype = jnp.bfloat16 if args.images > 1500 else jnp.float32

    ckpt = os.path.join(args.out, "rg_model.ckpt")
    t0 = time.time()
    state, history = trainer.fit(ds_full, epochs=args.epochs,
                                 batch_size=args.batch_size,
                                 weights_dtype=weights_dtype,
                                 checkpoint_path=ckpt)
    train_time = time.time() - t0
    print(f"training wall-clock: {train_time:.1f}s "
          f"({train_time / args.epochs:.1f}s/epoch incl. one-time graph build)")

    with open(os.path.join(args.out, "rg_training_history.json"), "w") as f:
        json.dump(history, f, indent=2)

    # Held-out eval. With --eval-stride the held-out set spans every COD10K
    # category; metrics are additionally reported on its CAM-only subset,
    # because NonCAM background images carry empty GT masks that zero out
    # IoU/F1 for any predictor.
    img_dir = os.path.join(args.data_root, "images")
    gt_dir = os.path.join(args.data_root, "gt_object")
    if held_out:
        eval_sets = {"all": [s.image_name for s in held_out]}
        cam = [n for n in eval_sets["all"] if "-CAM-" in n]
        if cam:
            eval_sets["cam_only"] = cam
        report = {"protocol": (f"interleaved held-out split (every "
                               f"{args.eval_stride}th image, excluded from "
                               f"training), {len(held_out)} images")}
        for name, file_list in eval_sets.items():
            print(f"evaluating on {len(file_list)} held-out images ({name})...")
            report[name] = evaluate_directory(
                ckpt, img_dir, gt_dir, n_segments=args.n_segments,
                batch_size=16, files=file_list)
        metrics = report
        printable = {k: round(v, 4)
                     for k, v in report.get("cam_only", report["all"]).items()
                     if not k.endswith("_std")}
    else:
        print(f"evaluating on {args.eval_images} held-out images...")
        metrics = evaluate_directory(
            ckpt, img_dir, gt_dir, n_segments=args.n_segments, batch_size=16,
            skip_images=args.images, max_images=args.eval_images)
        printable = {k: round(v, 4) for k, v in metrics.items()
                     if not k.endswith("_std")}
    with open(os.path.join(args.out, "rg_eval_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(printable, indent=2))


if __name__ == "__main__":
    main()
