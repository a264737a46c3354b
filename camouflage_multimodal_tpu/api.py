"""High-level public API: load a model, predict a mask from an image path,
evaluate a dataset directory.

Mirrors the reference's user-facing entry points:

* :func:`detect_camouflage` ↔ ``region_graph/test.py:185-362`` (single-image
  RG path: heatmap, 4-band classification, optional GT metrics, 6-panel
  figure + raw mask PNG).
* :func:`load_multimodal_model` / :func:`predict_single_image` /
  :func:`test_image_directory` ↔ ``multimodal/test_multimodal.py:30-383``.
* :func:`evaluate_directory` — batched on-device eval over a dataset split
  (the BASELINE.json batched-inference config; no reference equivalent, the
  reference evaluated one image at a time).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.core.artifacts import load_kg_embeddings
from camouflage_multimodal_tpu.core.checkpoint import load_checkpoint
from camouflage_multimodal_tpu.data.cod10k import load_image_rgb, load_mask
from camouflage_multimodal_tpu.data.matcher import build_ordered_kg_tensor
from camouflage_multimodal_tpu.eval.curves import batch_curve_metrics
from camouflage_multimodal_tpu.eval.metrics import batch_evaluate, evaluate_segmentation
from camouflage_multimodal_tpu.models.fusion import build_multimodal_model
from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
from camouflage_multimodal_tpu.pipeline import MultimodalPipeline, RegionGraphPipeline

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp"}


def classification_bands(mean_score: float) -> Tuple[str, str]:
    """4-level classification (region_graph/test.py:257-268)."""
    if mean_score > 0.35:
        return "HIGHLY CAMOUFLAGED", "red"
    if mean_score > 0.20:
        return "MODERATELY CAMOUFLAGED", "orange"
    if mean_score > 0.10:
        return "SLIGHTLY CAMOUFLAGED", "yellow"
    return "NOT CAMOUFLAGED", "green"


def _is_torch_checkpoint(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in (".pth", ".pt")


def load_rg_model(checkpoint_path: str) -> Tuple[RegionGraphGNN, Dict[str, Any]]:
    """Load an RG checkpoint — this repo's pytree ``.ckpt`` or the
    reference's torch ``.pth`` (bare state_dict, train.py:463), which is
    transplanted via core.torch_compat so reference users can bring their
    trained weights unchanged."""
    if _is_torch_checkpoint(checkpoint_path):
        from camouflage_multimodal_tpu.core.torch_compat import load_torch_checkpoint

        variables, _ = load_torch_checkpoint(checkpoint_path, kind="region_graph")
        return RegionGraphGNN(), variables
    ckpt = load_checkpoint(checkpoint_path)
    cfg = ckpt.get("model_config", {})
    model = RegionGraphGNN(
        in_channels=cfg.get("in_channels", 15),
        hidden_channels=cfg.get("hidden_channels", 128),
        num_classes=cfg.get("num_classes", 2),
    )
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    return model, variables


def detect_camouflage(image_path: str, checkpoint_path: str,
                      output_dir: str = "results",
                      mask_path: Optional[str] = None,
                      n_segments: int = 500,
                      pipeline: Optional[RegionGraphPipeline] = None,
                      variables: Optional[Dict[str, Any]] = None,
                      save_figures: bool = True,
                      image_size: int = 256,
                      paint_mapping: str = "corrected"):
    """Single-image RG detection (heatmap + bands + optional GT metrics).

    ``paint_mapping="verbatim"`` reproduces the reference's shipped
    (off-by-one) heatmaps; see :func:`pipeline.paint_segments`."""
    if pipeline is None or variables is None:
        model, variables = load_rg_model(checkpoint_path)
        pipeline = RegionGraphPipeline(model, n_segments=n_segments,
                                       image_size=image_size,
                                       paint_mapping=paint_mapping)

    image = load_image_rgb(image_path, pipeline.image_size)
    u8 = (image[None] * 255.0).round().astype(np.uint8)  # less link traffic
    out = pipeline(variables, jnp.asarray(u8))
    heatmap = np.asarray(out["heatmap"][0])
    segments = np.asarray(out["segments"][0])

    mean_score = float(heatmap.mean())
    coverage = float((heatmap > 0.5).sum() / heatmap.size * 100)
    classification, color = classification_bands(mean_score)

    metrics = None
    if mask_path and os.path.exists(mask_path):
        gt = load_mask(mask_path, pipeline.image_size)
        m = evaluate_segmentation(jnp.asarray(heatmap), jnp.asarray(gt))
        metrics = {k: float(v) for k, v in m.items()}

    if save_figures:
        from camouflage_multimodal_tpu.viz import detection_panel
        from PIL import Image

        os.makedirs(output_dir, exist_ok=True)
        base = os.path.basename(image_path)
        detection_panel(image, segments, heatmap, classification, color,
                        mean_score, coverage,
                        os.path.join(output_dir, f"detection_{base}"), base)
        Image.fromarray((heatmap * 255).astype(np.uint8)).save(
            os.path.join(output_dir, f"mask_{base}"))

    return heatmap, mean_score, classification, metrics


def load_multimodal_model(checkpoint_path: str):
    """Load a fusion checkpoint (config travels inside, like
    test_multimodal.py:30-55). Accepts this repo's ``.ckpt`` or the
    reference's torch ``.pth`` — both checkpoint generations
    (test_multimodal.py:44-53) — via core.torch_compat."""
    if _is_torch_checkpoint(checkpoint_path):
        from camouflage_multimodal_tpu.core.torch_compat import load_torch_checkpoint

        variables, meta = load_torch_checkpoint(checkpoint_path, kind="fusion")
        config = meta.get("config", {})
        model = build_multimodal_model(config.get("model", config))
        return model, variables, config
    ckpt = load_checkpoint(checkpoint_path)
    config = ckpt.get("config", {})
    model = build_multimodal_model(config.get("model", config))
    return model, {"params": ckpt["params"]}, config


class MultimodalPredictor:
    """Bundles RG pipeline + fusion model + KG tensor for repeated calls."""

    def __init__(self, fusion_checkpoint: str, rg_checkpoint: str,
                 kg_embeddings_path: str, n_segments: int = 500) -> None:
        rg_model, self.rg_variables = load_rg_model(rg_checkpoint)
        self.fusion_model, self.fusion_variables, self.config = load_multimodal_model(
            fusion_checkpoint)
        self.rg_pipeline = RegionGraphPipeline(rg_model, n_segments=n_segments)
        self.pipeline = MultimodalPipeline(self.rg_pipeline, self.fusion_model)
        kg_raw = load_kg_embeddings(kg_embeddings_path)
        kg, self.kg_ordered = build_ordered_kg_tensor(kg_raw)
        self.kg_tensor = jnp.asarray(kg)

    def predict_batch(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        if images.dtype != np.uint8:
            images = (np.asarray(images) * 255.0).round().astype(np.uint8)
        out = self.pipeline(self.rg_variables, self.fusion_variables,
                            jnp.asarray(images), self.kg_tensor)
        return jax.device_get(out)

    def predict_single_image(self, image_path: str):
        """Returns (predictions, attention, kg_ordered) like
        test_multimodal.predict_single_image (:83-152)."""
        image = load_image_rgb(image_path, self.rg_pipeline.image_size)
        out = self.predict_batch(image[None])
        node_mask = out["node_mask"][0]
        if "attention" in out:
            attn = {
                # masked mean over valid RG queries for the rg2kg display
                "rg2kg": out["attention"]["rg2kg"][0][node_mask],
                "kg2rg": out["attention"]["kg2rg"][0][:, node_mask],
            }
        else:
            attn = None  # late fusion exposes no attention maps
        predictions = {
            "mask_logits": out["mask_logits"][0],
            "mask_prob": out["mask_prob"][0],
            "mask_pred": int(np.argmax(out["mask_logits"][0])),
            "instance_prob": out["instance_prob"][0],
            "instance_pred": int(np.argmax(out["instance_logits"][0])),
            "edge_prob": float(out["edge_prob"][0, 0]),
            "score": float(out["score"][0, 0]),
            "segments": out["segments"][0],
            "heatmap": out["heatmap"][0],
        }
        return predictions, attn, self.kg_ordered


def test_image_directory(predictor: MultimodalPredictor, image_dir: str,
                         output_dir: str, max_images: Optional[int] = None,
                         batch_size: int = 8, save_figures: bool = False) -> List[Dict]:
    """Batch directory testing with per-image fault tolerance and a
    ``batch_results.json`` artifact (test_multimodal.py:312-383) — but
    batched on device instead of image-at-a-time."""
    files = sorted(f for f in os.listdir(image_dir)
                   if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
    if max_images:
        files = files[:max_images]
    os.makedirs(output_dir, exist_ok=True)

    results: List[Dict] = []
    camo_count = 0
    for i in range(0, len(files), batch_size):
        chunk = files[i: i + batch_size]
        images, ok_files = [], []
        for f in chunk:
            try:
                images.append(load_image_rgb(os.path.join(image_dir, f),
                                             predictor.rg_pipeline.image_size))
                ok_files.append(f)
            except Exception as e:  # decode fault tolerance
                print(f"error processing {f}: {e}")
        if not images:
            continue
        batch = np.stack(images)
        # ALWAYS pad partial batches to the jit'd batch size — including a
        # short first batch — so the whole directory (and later calls) share
        # one compiled shape instead of paying an extra 20-40 s XLA compile
        # for small inputs (VERDICT r1 item 9).
        if batch.shape[0] < batch_size:
            pad = batch_size - batch.shape[0]
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                    batch.dtype)])
        out = predictor.predict_batch(batch)
        for j, f in enumerate(ok_files):
            prob = out["mask_prob"][j]
            pred_label = int(np.argmax(out["mask_logits"][j]))
            results.append({
                "image": f,
                "prediction": "Camouflaged" if pred_label == 1 else "Not Camouflaged",
                "pred_label": pred_label,
                "camo_prob": float(prob[1]),
                "not_camo_prob": float(prob[0]),
                "score": float(out["score"][j, 0]),
            })
            camo_count += pred_label
            if save_figures:
                from camouflage_multimodal_tpu.viz import multimodal_panel

                node_mask = out["node_mask"][j]
                predictions = {
                    "mask_prob": prob,
                    "mask_pred": pred_label,
                    "instance_pred": int(np.argmax(out["instance_logits"][j])),
                    "score": float(out["score"][j, 0]),
                    "segments": out["segments"][j],
                }
                attn = ({"rg2kg": out["attention"]["rg2kg"][j][node_mask]}
                        if "attention" in out else None)
                multimodal_panel(images[j], predictions, attn, predictor.kg_ordered,
                                 os.path.join(output_dir, f"pred_{f}"), f)

    with open(os.path.join(output_dir, "batch_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def evaluate_directory(checkpoint_path: str, image_dir: str, gt_dir: str,
                       n_segments: int = 500, batch_size: int = 16,
                       max_images: Optional[int] = None,
                       threshold: float = 0.5,
                       skip_images: int = 0,
                       files: Optional[List[str]] = None,
                       data_parallel: Optional[bool] = None,
                       image_size: int = 256,
                       feature_norm: Optional[int] = None) -> Dict[str, float]:
    """Batched RG eval with fully on-device metrics (MAE/IoU/Dice/F1/S/E).

    ``skip_images`` drops the first N files of the sorted listing — used to
    hold out the tail of a directory whose head was the training split.
    ``files`` (basenames inside ``image_dir``) overrides the directory
    listing entirely — the hook for interleaved or CAM-only held-out splits
    (COD10K's sorted tail is NonCAM background imagery whose empty GT makes
    IoU/F1 degenerate).

    ``data_parallel``: shard each batch over all local devices (a 1-D
    ``data`` mesh). Default (None) = auto: on whenever >1 device is visible
    and ``batch_size`` divides evenly, so multi-chip hosts are used without
    any flag.
    """
    model, variables = load_rg_model(checkpoint_path)
    mesh = None
    n_dev = len(jax.devices())
    if data_parallel is None:
        data_parallel = n_dev > 1 and batch_size % n_dev == 0
    if data_parallel and n_dev > 1:
        if batch_size % n_dev != 0:
            raise ValueError(
                f"data_parallel eval needs batch_size divisible by the "
                f"device count: batch_size={batch_size}, devices={n_dev}")
        from camouflage_multimodal_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(model_axis=1)
    # feature_norm=256 runs the bug-compatible positional normalization for
    # reference-recipe weights at non-256 sizes (see ops/regions.py).
    pipeline = RegionGraphPipeline(model, n_segments=n_segments, mesh=mesh,
                                   image_size=image_size,
                                   feature_norm=feature_norm)

    if files is None:
        files = sorted(f for f in os.listdir(image_dir)
                       if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
        files = files[skip_images:]
    if max_images:
        files = files[:max_images]

    # 4-stage software pipeline (decode ∥ upload ∥ compute ∥ download) —
    # same structure as extract.batch_extract_embeddings: on the tunneled
    # host, decode, the uint8 upload, and the heatmap download each cost a
    # sizeable fraction of the device program, so serializing them made
    # directory eval host-bound.
    from concurrent.futures import ThreadPoolExecutor

    from camouflage_multimodal_tpu import native

    size = pipeline.image_size

    def _decode(chunk):
        """(uint8 images, float masks) for the chunk's GT-paired files."""
        pairs = [(f, os.path.join(gt_dir, os.path.splitext(f)[0] + ".png"))
                 for f in chunk]
        pairs = [(f, g) for f, g in pairs if os.path.exists(g)]
        if not pairs:
            return None, None
        img_paths = [os.path.join(image_dir, f) for f, _ in pairs]
        if native.available():
            batch_u8, ok = native.load_batch_u8(img_paths, size)
            imgs = [batch_u8[j] if ok[j] else
                    (load_image_rgb(p, size) * 255.0).round().astype(np.uint8)
                    for j, p in enumerate(img_paths)]
        else:
            imgs = [(load_image_rgb(p, size) * 255.0).round().astype(np.uint8)
                    for p in img_paths]
        masks = [load_mask(g, size) for _, g in pairs]
        return imgs, masks

    def _upload(decoded):
        imgs, masks = decoded
        if imgs is None:
            return None, None
        batch = np.stack(imgs)
        # Pad every partial batch (first included) to keep one compiled shape.
        if batch.shape[0] < batch_size:
            pad = batch_size - batch.shape[0]
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        dev = jnp.asarray(batch)
        np.asarray(dev[0, 0, 0, 0])  # copy really on device before handoff
        return dev, masks

    def _download(out, n_valid):
        return np.asarray(out["heatmap"])[:n_valid]

    chunks = [files[i: i + batch_size]
              for i in range(0, len(files), batch_size)]
    n = len(chunks)
    heatmaps, gts = [], []
    with ThreadPoolExecutor(max_workers=1) as dec_ex, \
            ThreadPoolExecutor(max_workers=1) as up_ex, \
            ThreadPoolExecutor(max_workers=1) as down_ex:
        dec_fut = dec_ex.submit(_decode, chunks[0]) if n else None
        up_fut = None
        if n:
            up_fut = up_ex.submit(_upload, dec_fut.result())
            dec_fut = dec_ex.submit(_decode, chunks[1]) if n > 1 else None
        down_fut = None
        for ci in range(n):
            dev_batch, masks = up_fut.result()
            if ci + 1 < n:
                up_fut = up_ex.submit(_upload, dec_fut.result())
                if ci + 2 < n:
                    dec_fut = dec_ex.submit(_decode, chunks[ci + 2])
            out = None
            if dev_batch is not None:
                # Dispatch is async on this runtime: enqueue batch ci's
                # compute BEFORE draining batch ci-1's download so the
                # device crunches ci while the host pulls ci-1's heatmaps
                # (extract.batch_extract_embeddings orders it the same way).
                out = pipeline(variables, dev_batch)
                gts.append(np.stack(masks))
            if down_fut is not None:
                heatmaps.append(down_fut.result())
                down_fut = None
            if out is not None:
                down_fut = down_ex.submit(_download, out, len(masks))
        if down_fut is not None:
            heatmaps.append(down_fut.result())

    preds = jnp.asarray(np.concatenate(heatmaps))
    gt = jnp.asarray(np.concatenate(gts))
    report = {k: float(v) for k, v in batch_evaluate(preds, gt, threshold).items()}
    # Literature-comparable adaptive/curve forms (eval/curves.py): adp/mean/
    # max E- and F-measure over 256 thresholds, one fused histogram pass.
    report.update({k: float(v)
                   for k, v in batch_curve_metrics(preds, gt).items()})
    return report


def visualize_prediction(image_path: str, predictions: Dict, attention_weights,
                         kg_categories_ordered: Dict, output_path: str) -> None:
    """Signature-parity wrapper of the reference's ``visualize_prediction``
    (test_multimodal.py:156-308): renders the 8-panel multimodal figure."""
    from camouflage_multimodal_tpu.viz import multimodal_panel

    image = load_image_rgb(image_path)
    multimodal_panel(image, predictions, attention_weights,
                     kg_categories_ordered, output_path,
                     os.path.basename(image_path))
