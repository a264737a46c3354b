#!/usr/bin/env python
"""End-to-end mask-fidelity gate vs the reference (VERDICT r1 item 1).

Protocol (BASELINE.md north star: ≥95% output fidelity vs reference masks):

1. ``graphs``  — build region graphs for train+test COD10K images with the
   reference-side executor (tools/reference_pipeline.py: canonical SLIC with
   skimage's knobs, skimage-style Canny, the reference's 15-feature loop),
   cached as npz.
2. ``train``   — train the reference RegionGraphGNN with the reference's OWN
   training recipe (region_graph/train.py:315-468: AdamW 1e-3/1e-4, cosine
   warm restarts T0=10 T_mult=2, CE weights [1,5]/[1,4], BCE pos_weight 3,
   task weights 2/1/0.5, clip 1.0, batch 4 via block-diagonal graph batch,
   80/20 split, best-val checkpoint) → artifacts/fidelity/best_model.pth.
3. ``compare`` — transplant the trained torch weights into the flax model
   (core/torch_compat) and run BOTH composed pipelines on the held-out
   images; report per-pixel binary mask agreement + heatmap MAE, plus a
   model-only fidelity split (torch vs flax on identical graphs) that
   isolates transplant fidelity from segmentation divergence
   → artifacts/fidelity_report.json.

Environment caveat (recorded in the report): skimage/torch_geometric are not
installed, so the "reference side" is a faithful numpy/scipy/torch
re-implementation of the reference stack, not the reference binaries.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

REF_DATA = "/root/reference/data/COD10K"
OUT_DIR = "artifacts/fidelity"
CACHE = os.path.join(OUT_DIR, "graphs")


def cache_dir(size: int) -> str:
    """Per-resolution reference-graph cache (256 keeps the r2 layout)."""
    return CACHE if size == 256 else f"{CACHE}_{size}"


def category_of(base: str) -> str:
    """COD10K environment token (CAM images) or 'NonCAM'."""
    parts = base.split("-")
    if len(parts) > 3 and parts[1] == "CAM":
        return parts[3]
    return "NonCAM"


def _all_quadruples():
    names = []
    for p in sorted(glob.glob(os.path.join(REF_DATA, "images", "*.jpg"))):
        base = os.path.splitext(os.path.basename(p))[0]
        gt = [os.path.join(REF_DATA, d, base + ".png")
              for d in ("gt_object", "gt_instance", "gt_edge")]
        if all(os.path.exists(g) for g in gt):
            names.append((base, p, *gt))
    return names


def quadruples(n_train: int, n_test: int, split: str = "stratified"):
    """Train/test image lists.

    ``stratified`` (default): interleaved strides over the FULL sorted
    COD10K listing, so both splits span every environment
    (Aquatic/Terrestrial/Flying/Amphibian/Other) AND the NonCAM tail —
    the r2 gate's first-170-sorted-images cohort was 100% Aquatic
    Pipefish (VERDICT r2 weak #1). Test offsets sit halfway between train
    strides, so the splits are disjoint by construction.
    ``sorted``: the r2 protocol (first n_train, next n_test), kept for
    reproducing the old report.
    """
    names = _all_quadruples()
    if split == "sorted":
        return names[:n_train], names[n_train:n_train + n_test]
    N = len(names)
    tr_stride = max(N // n_train, 1)
    te_stride = max(N // n_test, 1)
    tr_idx = list(range(0, N, tr_stride))[:n_train]
    used = set(tr_idx)
    te_off = tr_stride // 2
    te_idx = [i for i in range(te_off, N, te_stride) if i not in used][:n_test]
    train = [names[i] for i in tr_idx]
    test = [names[i] for i in te_idx]
    from collections import Counter
    print("train categories:", dict(Counter(category_of(b) for b, *_ in train)))
    print("test categories:", dict(Counter(category_of(b) for b, *_ in test)))
    return train, test


def stage_graphs(samples, n_segments=500, size=256):
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb, load_mask
    from reference_pipeline import build_reference_graph, node_labels_np

    cache = cache_dir(size)
    os.makedirs(cache, exist_ok=True)
    t0 = time.time()
    for i, (base, img_p, mask_p, inst_p, edge_p) in enumerate(samples):
        out = os.path.join(cache, base + ".npz")
        if os.path.exists(out):
            continue
        img = load_image_rgb(img_p, size).astype(np.float64)
        g = build_reference_graph(img, n_segments)
        labels = node_labels_np(g, load_mask(mask_p, size), load_mask(inst_p, size),
                                load_mask(edge_p, size))
        np.savez_compressed(
            out, features=g["features"], adjacency=g["adjacency"],
            weights=g["weights"], segments=g["segments"],
            id_map_keys=np.asarray(sorted(g["id_map"], key=g["id_map"].get)),
            **labels)
        if (i + 1) % 10 == 0:
            rate = (time.time() - t0) / (i + 1)
            print(f"[graphs] {i + 1}/{len(samples)} ({rate:.1f}s/img)", flush=True)


def _load_graph(base, size=256):
    z = np.load(os.path.join(cache_dir(size), base + ".npz"))
    id_map = {int(k): i for i, k in enumerate(z["id_map_keys"])}
    return {k: z[k] for k in z.files if k != "id_map_keys"} | {"id_map": id_map}


def _block_batch(graphs):
    """PyG-style block-diagonal batch: one dense graph, BN over all nodes."""
    x = torch.tensor(np.concatenate([g["features"] for g in graphs]))
    adj = torch.block_diag(*[torch.tensor(g["adjacency"]).float() for g in graphs])
    w = torch.block_diag(*[torch.tensor(g["weights"]) for g in graphs])
    y = torch.tensor(np.concatenate([g["y"] for g in graphs]))
    iy = torch.tensor(np.concatenate([g["instance_y"] for g in graphs]))
    ey = torch.tensor(np.concatenate([g["edge_y"] for g in graphs]))
    return x, adj, w, y, iy, ey


def _rg_ckpt(size: int) -> str:
    """Per-resolution fidelity weights. The reference model's position/area
    features are normalized by a HARD-CODED 256 (create_region_graph,
    region_graph/train.py:156-160 — reproduced at
    tools/reference_pipeline.py:290-292), so weights trained at 256² are
    off-distribution at any other size: measured at 352², the net stays
    CONFIDENT but chaotic (23% node flips between the two executors' graphs
    whose segment maps agree 94%+, median |Δfeature| 0.004). The gate
    therefore trains shared weights AT the measured resolution — it measures
    composed-pipeline agreement, which only isolates pipeline fidelity when
    the shared model is in-distribution."""
    return os.path.join(
        OUT_DIR, "best_model.pth" if size == 256 else f"best_model_{size}.pth")


def stage_train(train_samples, epochs=30, batch_size=4, lr=1e-3, seed=0,
                size=256, pos_weight=5.0):
    """Train the shared fidelity-probe weights.

    At 256² this is the reference's own recipe verbatim (train.py:315-468;
    pos_weight=5.0). At other sizes the reference cannot run at all (it
    hard-codes 256 in features and resize — test.py:119-121,209), so the
    probe has no recipe to honor; its only job is to be CONFIDENT (bimodal
    probabilities) so the composed pixel-agreement metric is sensitive
    rather than threshold-hugging. ``pos_weight`` > 5 pushes the positive
    class out of the diffuse 0.3-0.5 band the /256-normalized features
    otherwise produce at larger sizes. The compare report records the probe
    config used."""
    from reference_impl import RefRegionGraphGNN

    graphs = [_load_graph(b, size) for b, *_ in train_samples]
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    n_train = int(0.8 * len(graphs))
    perm = rng.permutation(len(graphs))
    tr, va = [graphs[i] for i in perm[:n_train]], [graphs[i] for i in perm[n_train:]]

    model = RefRegionGraphGNN()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=10, T_mult=2)
    crit_mask = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, pos_weight]))
    crit_inst = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 4.0]))
    crit_edge = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([3.0]))
    tw = {"mask": 2.0, "instance": 1.0, "edge": 0.5}

    def run_batches(batch_graphs, train):
        model.train(train)
        total, correct, count = 0.0, 0, 0
        order = rng.permutation(len(batch_graphs)) if train else np.arange(len(batch_graphs))
        for s in range(0, len(order), batch_size):
            chunk = [batch_graphs[i] for i in order[s:s + batch_size]]
            x, adj, w, y, iy, ey = _block_batch(chunk)
            with torch.set_grad_enabled(train):
                mo, io, eo = model(x, adj, w)
                loss = (crit_mask(mo, y) * tw["mask"]
                        + crit_inst(io, iy) * tw["instance"]
                        + crit_edge(eo.squeeze(-1), ey) * tw["edge"])
            if train:
                opt.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
                opt.step()
            total += float(loss.detach())
            correct += int((mo.argmax(1) == y).sum())
            count += len(y)
        return total / max(1, (len(order) + batch_size - 1) // batch_size), 100 * correct / count

    os.makedirs(OUT_DIR, exist_ok=True)
    best = float("inf")
    t0 = time.time()
    for epoch in range(epochs):
        tr_loss, tr_acc = run_batches(tr, True)
        sched.step()
        va_loss, va_acc = run_batches(va, False)
        print(f"[train] epoch {epoch + 1}/{epochs} loss {tr_loss:.4f} mask {tr_acc:.1f}% "
              f"| val {va_loss:.4f} mask {va_acc:.1f}% ({time.time() - t0:.0f}s)", flush=True)
        if va_loss < best:
            best = va_loss
            torch.save(model.state_dict(), _rg_ckpt(size))
    with open(_rg_ckpt(size) + ".config.json", "w") as f:
        json.dump({"epochs": epochs, "batch_size": batch_size, "lr": lr,
                   "seed": seed, "size": size, "pos_weight": pos_weight,
                   "reference_recipe_verbatim": pos_weight == 5.0}, f)
    if size == 256:
        torch.save(model.state_dict(),
                   os.path.join(OUT_DIR, "region_graph_model.pth"))


def stage_compare(test_samples, n_segments=500, size=256):
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from camouflage_multimodal_tpu.api import load_rg_model
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb, load_mask
    from camouflage_multimodal_tpu.pipeline import RegionGraphPipeline, padded_nodes
    from reference_impl import RefRegionGraphGNN
    from reference_pipeline import reference_heatmap

    ckpt = _rg_ckpt(size)
    tmodel = RefRegionGraphGNN()
    tmodel.load_state_dict(torch.load(ckpt, weights_only=True))
    tmodel.eval()
    jmodel, variables = load_rg_model(ckpt)
    # feature_norm=256: the reference hard-codes /256 positional-feature
    # normalization at ANY resolution (train.py:156-160), so composed
    # agreement against reference-recipe weights must run the JAX pipeline
    # in the bug-compatible mode (identical at 256; at 352 the framework's
    # corrected /H/W normalization fed the shared probe out-of-distribution
    # features and cost ~16% pixel agreement — the r4 gate failure's root
    # cause).
    pipe = RegionGraphPipeline(jmodel, n_segments=n_segments, image_size=size,
                               feature_norm=256)

    per_image = []
    batch_imgs, bases = [], []
    for base, img_p, mask_p, *_ in test_samples:
        batch_imgs.append(load_image_rgb(img_p, size))
        bases.append((base, mask_p))
    B = 10
    jax_heat = {}
    jax_graphs = {}
    for s in range(0, len(batch_imgs), B):
        chunk = np.stack(batch_imgs[s:s + B])
        pad = B - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = jax.device_get(pipe(variables, jnp.asarray(
            (chunk * 255.0).round().astype(np.uint8))))
        for j in range(min(B, len(batch_imgs) - s)):
            name = bases[s + j][0]
            jax_heat[name] = out["heatmap"][j]
            jax_graphs[name] = {
                "features": out["region_features"][j],
                "node_mask": out["node_mask"][j],
                "segments": out["segments"][j],
                "mask_logits": out["mask_logits"][j],
            }

    agree_v, agree_c, maes, model_agree, qual = [], [], [], [], {"ref": [], "jax": []}
    posfrac = {"ref": [], "jax": []}
    # Threshold sweep: a shared model whose probabilities hover below 0.5
    # (the reference's hard-coded /256 feature normalization makes its own
    # recipe under-confident at non-256 sizes) yields all-background binary
    # maps at the paint-back threshold — agreement there is trivially 1.0.
    # Sweeping thresholds through the occupied probability range keeps the
    # pixel-agreement metric SENSITIVE regardless of model confidence; the
    # gate requires the minimum across the sweep.
    sweep_ts = (0.25, 0.35, 0.5)
    sweep = {t: {"agree": [], "ref_pos": []} for t in sweep_ts}
    for base, mask_p in bases:
        g = _load_graph(base, size)
        h_ref_v = reference_heatmap(tmodel, g, mapping="verbatim")
        h_ref_c = reference_heatmap(tmodel, g, mapping="corrected")
        h_jax = jax_heat[base]

        bv, bc, bj = h_ref_v > 0.5, h_ref_c > 0.5, h_jax > 0.5
        agree_v.append(float((bv == bj).mean()))
        agree_c.append(float((bc == bj).mean()))
        maes.append(float(np.abs(h_ref_c - h_jax).mean()))
        posfrac["ref"].append(float(bc.mean()))
        posfrac["jax"].append(float(bj.mean()))
        for t in sweep_ts:
            sweep[t]["agree"].append(float(((h_ref_c > t) == (h_jax > t)).mean()))
            sweep[t]["ref_pos"].append(float((h_ref_c > t).mean()))

        # model-only fidelity: torch model on the JAX pipeline's own graphs
        jg = jax_graphs[base]
        mask = jg["node_mask"]
        feats = torch.tensor(np.asarray(jg["features"][mask]))
        seg = np.asarray(jg["segments"])
        # rebuild dense adjacency/weights exactly as the pipeline's RAG does
        from camouflage_multimodal_tpu.ops.rag import rag_edge_weights, region_adjacency
        K = jg["features"].shape[0]
        adj = np.asarray(region_adjacency(jnp.asarray(seg), K))
        w = np.asarray(rag_edge_weights(jnp.asarray(jg["features"]), jnp.asarray(adj)))
        valid = np.where(mask)[0]
        adj_t = torch.tensor(adj[np.ix_(valid, valid)]).float()
        w_t = torch.tensor(w[np.ix_(valid, valid)])
        with torch.no_grad():
            mo, _, _ = tmodel(feats, adj_t, w_t)
        t_pred = mo.argmax(1).numpy()
        j_pred = np.asarray(jg["mask_logits"][mask]).argmax(1)
        model_agree.append(float((t_pred == j_pred).mean()))

        gt = load_mask(mask_p, size) > 0.5
        if gt.sum() > 0:  # NonCAM GT is empty; IoU would be degenerate
            for tag, hm in (("ref", h_ref_c), ("jax", h_jax)):
                pb = hm > 0.5
                inter = (pb & gt).sum()
                union = pb.sum() + gt.sum() - inter
                qual[tag].append(float(inter / (union + 1e-8)))

        per_image.append({"image": base,
                          "category": category_of(base),
                          "pixel_agreement_verbatim": agree_v[-1],
                          "pixel_agreement_corrected": agree_c[-1],
                          "heatmap_mae": maes[-1],
                          "model_node_agreement": model_agree[-1]})

    from collections import defaultdict
    by_cat = defaultdict(list)
    for rec in per_image:
        by_cat[rec["category"]].append(rec)
    per_category = {
        c: {"n": len(v),
            "pixel_agreement_corrected": float(np.mean(
                [r["pixel_agreement_corrected"] for r in v])),
            "pixel_agreement_verbatim": float(np.mean(
                [r["pixel_agreement_verbatim"] for r in v])),
            "heatmap_mae": float(np.mean([r["heatmap_mae"] for r in v]))}
        for c, v in sorted(by_cat.items())
    }
    report = {
        "n_test_images": len(bases),
        "image_size": size,
        "pixel_agreement_vs_reference_verbatim_paintback": float(np.mean(agree_v)),
        "pixel_agreement_vs_reference_corrected_paintback": float(np.mean(agree_c)),
        "heatmap_mae_vs_reference": float(np.mean(maes)),
        "model_only_node_agreement": float(np.mean(model_agree)),
        "iou_vs_gt_cam_only": {k: float(np.mean(v)) for k, v in qual.items()},
        "per_category": per_category,
        # Degeneracy guard + threshold sweep: at thresholds the model never
        # crosses, both binary maps are all-background and agreement is
        # trivially 1.0. The sweep keeps the metric sensitive — the gate
        # requires the MINIMUM agreement across thresholds whose
        # reference-side positive fraction is non-trivial (>0.5%).
        "binary_positive_fraction": {
            k: float(np.mean(v)) for k, v in posfrac.items()},
        "agreement_by_threshold": {
            str(t): {"pixel_agreement": float(np.mean(v["agree"])),
                     "ref_positive_fraction": float(np.mean(v["ref_pos"]))}
            for t, v in sweep.items()},
        "gate": {"target": 0.95,
                 "degenerate_at_paintback_threshold": bool(
                     np.mean(posfrac["ref"]) < 0.005),
                 "min_nontrivial_threshold_agreement": float(min(
                     [np.mean(v["agree"]) for v in sweep.values()
                      if np.mean(v["ref_pos"]) >= 0.005] or [float("nan")])),
                 "passed": bool(
                     np.mean(agree_c) >= 0.95
                     # at least one sweep threshold must be non-trivial, and
                     # every non-trivial one must clear the target
                     and any(np.mean(v["ref_pos"]) >= 0.005
                             for v in sweep.values())
                     and all(np.mean(v["agree"]) >= 0.95
                             for v in sweep.values()
                             if np.mean(v["ref_pos"]) >= 0.005)),
                 "passed_every_category": bool(all(
                     v["pixel_agreement_corrected"] >= 0.95
                     for v in per_category.values()))},
        "notes": [
            "Reference side is a faithful numpy/scipy/torch re-implementation "
            "(tools/reference_pipeline.py) — skimage/torch_geometric are not "
            "installed in this environment, so the reference scripts cannot "
            "run verbatim.",
            "The reference's own paint-back (test.py:241-244) indexes "
            "mask_probs[region_id] while node i corresponds to segment label "
            "i+1 under skimage>=0.21 start_label=1 — an off-by-one the "
            "'verbatim' row reproduces and the 'corrected' row fixes via the "
            "region_id_map the reference builds but never applies.",
            "Weights: torch model trained by the reference's own recipe "
            "(train.py:315-468) on COD10K, transplanted into flax via "
            "core/torch_compat.py.",
        ],
        "per_image": per_image,
    }
    probe_cfg = _rg_ckpt(size) + ".config.json"
    if os.path.exists(probe_cfg):
        with open(probe_cfg) as f:
            report["probe_training_config"] = json.load(f)
    out_name = ("artifacts/fidelity_report.json" if size == 256
                else f"artifacts/fidelity_report_{size}.json")
    if size != 256:
        report["notes"].append(
            "Weights trained AT this resolution (stage train --size "
            f"{size}): the reference hard-codes /256 position/area feature "
            "normalization, so 256-trained weights are off-distribution at "
            "other sizes. The gate measures composed-pipeline AGREEMENT "
            "between the torch reference executor and the JAX pipeline; "
            "both sides share the same weights.")
        report["notes"].append(
            "JAX pipeline runs with feature_norm=256 (bug-compatible with "
            "the reference's hard-coded /256 normalizer) so both stacks "
            "feed the shared weights the same feature distribution; the "
            "framework's production default normalizes by actual H/W "
            "(PARITY.md Known deltas).")
    with open(out_name, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_image"}, indent=2))


def _kg_tensor_sorted():
    """Sorted-category KG tensor, matching build_ordered_kg_tensor
    (test_multimodal.py:58-82)."""
    z = np.load("artifacts/kg_embeddings/all_embeddings.npz")
    cats = sorted(z.files)
    return np.stack([z[c] for c in cats]).astype(np.float32), cats


def _mask_label(mask: np.ndarray) -> tuple:
    """train_multimodal.py:62-92 heuristic, sans the cv2 edge/contour branch
    (both branches assign label 1; only confidence differs, and on CAM GT
    masks mean_intensity dominates)."""
    mean_intensity = float(mask.mean())
    non_zero = float((mask > 10 / 255.0).mean())
    if mean_intensity > 0.1 and non_zero > 0.05:
        return 1, min(mean_intensity * 2, 1.0)
    return 0, 1.0 - mean_intensity


def stage_fusion_train(train_samples, epochs=8, batch_size=8, seed=0):
    """Train the reference's OWN fusion model (fusion_model.py imported
    verbatim) with its own recipe (train_multimodal.py:223-279: aggressive
    focal 3.0 + CE 1.0 + BCE 0.5 + MSE 0.3, AdamW, clip 1.0) on embeddings
    from the fidelity-trained torch RG model."""
    from camouflage_multimodal_tpu.data.cod10k import load_mask
    from reference_impl import RefRegionGraphGNN, load_reference_fusion_module

    fm = load_reference_fusion_module()
    tmodel = RefRegionGraphGNN()
    tmodel.load_state_dict(torch.load(os.path.join(OUT_DIR, "best_model.pth"),
                                      weights_only=True))
    tmodel.eval()
    kg_np, _ = _kg_tensor_sorted()
    kg = torch.tensor(kg_np).unsqueeze(0)

    samples = []
    for base, img_p, mask_p, *_ in train_samples:
        g = _load_graph(base)
        with torch.no_grad():
            emb = tmodel.extract_node_embeddings(
                torch.tensor(g["features"]).float(),
                torch.tensor(g["adjacency"]).float(),
                torch.tensor(g["weights"]).float())
        label, conf = _mask_label(load_mask(mask_p, 256))
        samples.append({"emb": emb, "label": label, "conf": conf})
    n1 = sum(s["label"] for s in samples)
    print(f"[fusion-train] {len(samples)} samples, class1={n1}", flush=True)

    torch.manual_seed(seed)
    model_cfg = {"rg_dim": 128, "kg_dim": 128, "hidden_dim": 256,
                 "num_heads": 8, "fusion_type": "cross_attention",
                 "num_classes": 2, "dropout": 0.3}
    fusion = fm.build_multimodal_model(model_cfg)
    opt = torch.optim.AdamW(fusion.parameters(), lr=1e-4, weight_decay=1e-4)
    focal = fm.__dict__.get("AggressiveFocalLoss")
    if focal is None:  # focal loss lives in train_multimodal.py, not fusion_model
        class _Focal(torch.nn.Module):
            def __init__(self, alpha=0.75, gamma=3.0):
                super().__init__()
                self.alpha, self.gamma = alpha, gamma

            def forward(self, logits, target):
                ce = torch.nn.functional.cross_entropy(logits, target, reduction="none")
                pt = torch.exp(-ce)
                alpha_t = torch.where(target == 1, self.alpha, 1 - self.alpha)
                return (alpha_t * (1 - pt) ** self.gamma * ce).mean()
        focal = _Focal
    focal_fn = focal()
    bce = torch.nn.BCEWithLogitsLoss()
    mse = torch.nn.MSELoss()
    rng = np.random.default_rng(seed)

    for epoch in range(epochs):
        order = rng.permutation(len(samples))
        tot, correct = 0.0, 0
        fusion.train()
        for s in range(0, len(order), batch_size):
            opt.zero_grad()
            for i in order[s:s + batch_size]:
                sm = samples[i]
                y = torch.tensor([sm["label"]])
                mo, io, eo, so = fusion(sm["emb"].unsqueeze(0), kg)
                loss = (focal_fn(mo, y) * 3.0
                        + torch.nn.functional.cross_entropy(io, y) * 1.0
                        + bce(eo.squeeze(1), y.float()) * 0.5
                        + mse(so.squeeze(1), torch.tensor([sm["conf"]])) * 0.3)
                loss.backward()
                tot += float(loss.detach())
                correct += int(mo.argmax(1).item() == sm["label"])
            torch.nn.utils.clip_grad_norm_(fusion.parameters(), max_norm=1.0)
            opt.step()
        print(f"[fusion-train] epoch {epoch + 1}/{epochs} "
              f"loss {tot / len(order):.4f} acc {100 * correct / len(order):.1f}%",
              flush=True)

    torch.save({"model_state_dict": fusion.state_dict(),
                "config": {"model": model_cfg},
                "epoch": epochs, "val_loss": tot / len(order),
                "val_f1_class_1": 0.0, "val_f1_avg": 0.0,
                "val_acc_0": 0.0, "val_acc_1": 0.0},
               os.path.join(OUT_DIR, "multimodal_best.pth"))


def stage_fusion_compare(test_samples):
    """Composed multimodal fidelity: torch stack (reference graphs → torch RG
    embeddings → reference fusion_model.py) vs the JAX MultimodalPredictor
    under transplanted weights (test_multimodal.py:83-152 protocol).

    Also reports a fusion-model-only split: the torch fusion model run on the
    JAX pipeline's own node embeddings, isolating fusion-transplant fidelity
    from upstream segmentation divergence."""
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    from camouflage_multimodal_tpu.api import MultimodalPredictor
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb
    from reference_impl import RefRegionGraphGNN, load_reference_fusion_module

    fm = load_reference_fusion_module()
    tmodel = RefRegionGraphGNN()
    tmodel.load_state_dict(torch.load(os.path.join(OUT_DIR, "best_model.pth"),
                                      weights_only=True))
    tmodel.eval()
    blob = torch.load(os.path.join(OUT_DIR, "multimodal_best.pth"),
                      weights_only=False)
    tfusion = fm.build_multimodal_model(blob["config"]["model"])
    tfusion.load_state_dict(blob["model_state_dict"])
    tfusion.eval()
    kg_np, _ = _kg_tensor_sorted()
    kg = torch.tensor(kg_np).unsqueeze(0)

    pred = MultimodalPredictor(
        fusion_checkpoint=os.path.join(OUT_DIR, "multimodal_best.pth"),
        rg_checkpoint=os.path.join(OUT_DIR, "best_model.pth"),
        kg_embeddings_path="artifacts/kg_embeddings/all_embeddings.npz")

    per_image, agree_mask, agree_inst = [], [], []
    score_mae, edge_mae, prob_mae = [], [], []
    mo_agree, mo_score = [], []
    for base, img_p, *_ in test_samples:
        jp, jattn, _ = pred.predict_single_image(img_p)

        g = _load_graph(base)
        with torch.no_grad():
            emb = tmodel.extract_node_embeddings(
                torch.tensor(g["features"]).float(),
                torch.tensor(g["adjacency"]).float(),
                torch.tensor(g["weights"]).float())
            mo, io, eo, so, _ = tfusion(emb.unsqueeze(0), kg,
                                        return_attention=True)
        t_mask, t_inst = int(mo.argmax(1)), int(io.argmax(1))
        t_prob = torch.softmax(mo, 1)[0].numpy()
        agree_mask.append(float(t_mask == jp["mask_pred"]))
        agree_inst.append(float(t_inst == jp["instance_pred"]))
        score_mae.append(abs(float(so[0, 0]) - jp["score"]))
        edge_mae.append(abs(float(torch.sigmoid(eo)[0, 0]) - jp["edge_prob"]))
        prob_mae.append(float(np.abs(t_prob - np.asarray(jp["mask_prob"])).mean()))

        # model-only split: torch fusion on the JAX pipeline's embeddings
        img_u8 = (load_image_rgb(img_p, 256) * 255).round().astype(np.uint8)
        rg_out = jax.device_get(pred.rg_pipeline(pred.rg_variables,
                                                 img_u8[None]))
        valid = rg_out["node_mask"][0]
        j_emb = torch.tensor(np.asarray(rg_out["node_embeddings"][0][valid]))
        with torch.no_grad():
            mo2, _, _, so2, _ = tfusion(j_emb.unsqueeze(0), kg,
                                        return_attention=True)
        mo_agree.append(float(int(mo2.argmax(1)) == jp["mask_pred"]))
        mo_score.append(abs(float(so2[0, 0]) - jp["score"]))

        per_image.append({
            "image": base, "mask_pred_agree": agree_mask[-1],
            "instance_pred_agree": agree_inst[-1],
            "score_abs_diff": score_mae[-1], "edge_prob_abs_diff": edge_mae[-1],
            "mask_prob_mae": prob_mae[-1],
            "model_only_mask_agree": mo_agree[-1],
            "model_only_score_abs_diff": mo_score[-1]})

    report = {
        "n_test_images": len(test_samples),
        "composed": {
            "mask_pred_agreement": float(np.mean(agree_mask)),
            "instance_pred_agreement": float(np.mean(agree_inst)),
            "score_mae": float(np.mean(score_mae)),
            "edge_prob_mae": float(np.mean(edge_mae)),
            "mask_prob_mae": float(np.mean(prob_mae)),
        },
        "fusion_model_only": {
            "mask_pred_agreement": float(np.mean(mo_agree)),
            "score_mae": float(np.mean(mo_score)),
        },
        "gate": {"target": 0.95,
                 "passed": bool(np.mean(agree_mask) >= 0.95)},
        "notes": [
            "torch side: the reference's own fusion_model.py (imported "
            "verbatim) trained by the reference recipe "
            "(train_multimodal.py:223-279) on fidelity-RG embeddings; JAX "
            "side: MultimodalPredictor with both checkpoints transplanted "
            "via core/torch_compat.",
            "'composed' runs both full stacks from the image; "
            "'fusion_model_only' feeds the JAX pipeline's embeddings to the "
            "torch fusion model, isolating transplant fidelity.",
        ],
        "per_image": per_image,
    }
    with open("artifacts/fidelity_fusion_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_image"},
                     indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "graphs", "train", "compare",
                             "fusion-train", "fusion-compare"])
    ap.add_argument("--n-train", type=int, default=120)
    ap.add_argument("--n-test", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed — bump if the trained model is "
                         "degenerate (never crosses 0.5; the compare stage "
                         "reports binary_positive_fraction and fails the "
                         "gate on degeneracy)")
    ap.add_argument("--pos-weight", type=float, default=5.0,
                    help="mask-loss positive class weight; 5.0 = reference "
                         "recipe. Raise (e.g. 8) for non-256 probes where "
                         "the reference's /256 normalization makes its own "
                         "recipe diffuse (see stage_train docstring)")
    ap.add_argument("--split", default="stratified",
                    choices=["stratified", "sorted"])
    ap.add_argument("--size", type=int, default=256,
                    help="image resolution (352/416 = the benchmark shapes; "
                         "graphs/train/compare all honor it — shared "
                         "weights are trained at the measured resolution)")
    args = ap.parse_args()

    train_s, test_s = quadruples(args.n_train, args.n_test, args.split)
    print(f"{len(train_s)} train / {len(test_s)} test images")
    if args.stage in ("all", "graphs"):
        stage_graphs(train_s + test_s, size=args.size)
    if args.stage in ("all", "train"):
        stage_train(train_s, epochs=args.epochs, size=args.size,
                    seed=args.seed, pos_weight=args.pos_weight)
    if args.stage in ("all", "compare"):
        stage_compare(test_s, size=args.size)
    # The fusion stages are a 256-only protocol: they consume the 256 graph
    # cache, the 256 probe (best_model.pth), and load_mask/load_image at
    # 256 (the reference's multimodal stack hard-codes 256 end to end —
    # train_multimodal.py / test_multimodal.py). Running them against a
    # non-256 --size would silently mix resolutions (advisor r4).
    if args.stage in ("fusion-train", "fusion-compare") and args.size != 256:
        ap.error("--stage fusion-* is a 256-only protocol (the reference "
                 "multimodal stack hard-codes 256); drop --size")
    if args.stage in ("all", "fusion-train"):
        if args.size != 256:
            print("[skip] fusion-train: 256-only protocol, --size "
                  f"{args.size} requested", flush=True)
        else:
            stage_fusion_train(train_s)
    if args.stage in ("all", "fusion-compare"):
        if args.size != 256:
            print("[skip] fusion-compare: 256-only protocol, --size "
                  f"{args.size} requested", flush=True)
        else:
            stage_fusion_compare(test_s)


if __name__ == "__main__":
    main()
