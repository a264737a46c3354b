"""Fusion quality anchor: the reference's OWN fusion recipe vs FusionTrainer
on the full matched dataset, identical split (VERDICT r2 item 4).

torch side: the reference's ``fusion_model.py`` imported verbatim
(tools/reference_impl.load_reference_fusion_module) trained by its own
recipe — ``train_multimodal.py:223-509``: AggressiveFocalLoss(0.75, 3.0)·3.0
+ CE·1.0 + BCE·0.5 + MSE·0.3 summed per sample inside the batch, one
optimizer step per 4-sample batch, clip 1.0, AdamW(5e-4, 1e-4),
CosineAnnealingWarmRestarts(T_0=10, T_mult=2) per epoch, 5×
confidence-scaled minority oversampling, 50%-probability ±0.01 noise,
best-F1-class-1 checkpoint with patience 15.

JAX side: the best rows of the committed full-scale FusionTrainer runs
(artifacts/checkpoints{,_balanced}/training_history_fixed.json), which used
the SAME FusionDataset labels and the same seed-0 80/20 permutation split.

Adds a ``fusion`` section to artifacts/quality_table.json. Run:

    python scripts/fusion_quality_anchor.py                # full (slow, CPU)
    python scripts/fusion_quality_anchor.py --epochs 30
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

REF_DATA = "/root/reference/data/COD10K"


def build_dataset():
    from camouflage_multimodal_tpu.data.matcher import EmbeddingMatcher
    from camouflage_multimodal_tpu.train.train_fusion import FusionDataset

    matcher = EmbeddingMatcher(
        os.path.join(REPO, "artifacts/rg_embeddings/all_rg_embeddings.npz"),
        os.path.join(REPO, "artifacts/kg_embeddings/all_embeddings.npz"))
    matched = matcher.create_matched_dataset(use_all_kg_categories=True)
    return FusionDataset(matched, os.path.join(REF_DATA, "gt_object"),
                         os.path.join(REF_DATA, "gt_instance"),
                         os.path.join(REF_DATA, "gt_edge"), augment=False)


def f1_metrics(preds, labels):
    from camouflage_multimodal_tpu.train.train_fusion import calculate_f1_score

    return calculate_f1_score(np.asarray(preds), np.asarray(labels))


def train_reference_recipe(dataset, epochs=30, batch_size=4, seed=0,
                           max_patience=15, log=print):
    from reference_impl import load_reference_fusion_module

    fm = load_reference_fusion_module()

    class AggressiveFocalLoss(torch.nn.Module):
        # train_multimodal.py:29-57
        def __init__(self, alpha=0.75, gamma=3.0):
            super().__init__()
            self.alpha, self.gamma = alpha, gamma

        def forward(self, logits, target):
            ce = torch.nn.functional.cross_entropy(logits, target,
                                                   reduction="none")
            pt = torch.exp(-ce)
            alpha_t = torch.where(target == 1,
                                  torch.tensor(self.alpha),
                                  torch.tensor(1 - self.alpha))
            return (alpha_t * (1 - pt) ** self.gamma * ce).mean()

    # identical split to FusionTrainer (seed-0 permutation, 80/20)
    rng = np.random.default_rng(seed)
    n = len(dataset)
    perm = rng.permutation(n)
    n_train = int(0.8 * n)
    train_idx, val_idx = perm[:n_train], perm[n_train:]
    weights = np.asarray(dataset.get_aggressive_sample_weights())
    p = weights[train_idx] / weights[train_idx].sum()

    torch.manual_seed(seed)
    model_cfg = {"rg_dim": 128, "kg_dim": 128, "hidden_dim": 256,
                 "num_heads": 8, "fusion_type": "cross_attention",
                 "num_classes": 2, "dropout": 0.3}
    model = fm.build_multimodal_model(model_cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2)
    focal = AggressiveFocalLoss()
    bce = torch.nn.BCEWithLogitsLoss()
    mse = torch.nn.MSELoss()
    ce = torch.nn.CrossEntropyLoss()

    def tensors(i, augment):
        s = dataset.samples[i]
        rg = torch.tensor(np.asarray(s["rg_node_embeddings"], np.float32))
        kg = torch.tensor(np.asarray(s["kg_embeddings"], np.float32))
        if augment and torch.rand(1) > 0.5:  # train_multimodal.py:172-175
            rg = rg + torch.randn_like(rg) * 0.01
            kg = kg + torch.randn_like(kg) * 0.01
        return rg.unsqueeze(0), kg.unsqueeze(0), s

    history = {k: [] for k in ("train_loss", "val_loss", "train_f1_class_1",
                               "val_f1_class_0", "val_f1_class_1",
                               "val_f1_avg", "val_acc_0", "val_acc_1")}
    best = {"f1": 0.0}
    patience = 0
    t0 = time.time()
    for epoch in range(epochs):
        sampled = rng.choice(train_idx, size=len(train_idx), replace=True, p=p)
        model.train()
        tot, preds, labels = 0.0, [], []
        for s0 in range(0, len(sampled), batch_size):
            opt.zero_grad()
            for i in sampled[s0:s0 + batch_size]:
                rg, kg, s = tensors(int(i), augment=True)
                y = torch.tensor([s["label"]])
                mo, io, eo, so = model(rg, kg)
                loss = (focal(mo, y) * 3.0
                        + torch.nn.functional.cross_entropy(io, y) * 1.0
                        + bce(eo.squeeze(1), torch.tensor([s["edge_label"]])) * 0.5
                        + mse(so.squeeze(1), torch.tensor([s["score_label"]])) * 0.3)
                loss.backward()  # per-sample grad accumulation (:270)
                tot += float(loss.detach())
                preds.append(int(mo.argmax(1)))
                labels.append(s["label"])
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
            opt.step()
        sched.step()
        tr_f1 = f1_metrics(preds, labels)
        train_loss = tot / max(len(preds), 1)

        model.eval()
        vtot, vpreds, vlabels = 0.0, [], []
        with torch.no_grad():
            for i in val_idx:
                rg, kg, s = tensors(int(i), augment=False)
                y = torch.tensor([s["label"]])
                mo, _, _, _ = model(rg, kg)
                vtot += float(ce(mo, y))
                vpreds.append(int(mo.argmax(1)))
                vlabels.append(s["label"])
        va_f1 = f1_metrics(vpreds, vlabels)
        vp, vl = np.asarray(vpreds), np.asarray(vlabels)
        acc0 = 100.0 * ((vp == vl) & (vl == 0)).sum() / max((vl == 0).sum(), 1)
        acc1 = 100.0 * ((vp == vl) & (vl == 1)).sum() / max((vl == 1).sum(), 1)

        history["train_loss"].append(train_loss)
        history["val_loss"].append(vtot / max(len(vpreds), 1))
        history["train_f1_class_1"].append(tr_f1["f1_class_1"])
        history["val_f1_class_0"].append(va_f1["f1_class_0"])
        history["val_f1_class_1"].append(va_f1["f1_class_1"])
        history["val_f1_avg"].append(va_f1["f1_avg"])
        history["val_acc_0"].append(acc0)
        history["val_acc_1"].append(acc1)
        log(f"[ref-recipe] epoch {epoch + 1}/{epochs} loss {train_loss:.4f} "
            f"| val F1_C1 {va_f1['f1_class_1']:.3f} F1_avg {va_f1['f1_avg']:.3f} "
            f"Acc0 {acc0:.1f}% Acc1 {acc1:.1f}% ({time.time() - t0:.0f}s)")

        if va_f1["f1_class_1"] > best["f1"]:
            best = {"f1": va_f1["f1_class_1"], "epoch": epoch,
                    "val_f1_class_0": va_f1["f1_class_0"],
                    "val_f1_class_1": va_f1["f1_class_1"],
                    "val_f1_avg": va_f1["f1_avg"],
                    "val_acc_0": acc0, "val_acc_1": acc1}
            patience = 0
        else:
            patience += 1
            if patience >= max_patience:
                log(f"[ref-recipe] early stop after {patience} stale epochs")
                break
    return best, history


def jax_best_row(history_path):
    """Best-F1-class-1 epoch of a committed FusionTrainer history."""
    if not os.path.exists(history_path):
        return None
    h = json.load(open(history_path))
    i = int(np.argmax(h["val_f1_class_1"]))
    return {"epoch": i,
            "val_f1_class_0": h["val_f1_class_0"][i],
            "val_f1_class_1": h["val_f1_class_1"][i],
            "val_f1_avg": h["val_f1_avg"][i],
            "val_acc_0": h["val_acc_0"][i], "val_acc_1": h["val_acc_1"][i]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    dataset = build_dataset()
    labels = [s["label"] for s in dataset.samples]
    print(f"{len(dataset.samples)} samples, class1={sum(labels)}")

    best, history = train_reference_recipe(dataset, epochs=args.epochs,
                                           batch_size=args.batch_size)

    table_path = os.path.join(REPO, "artifacts/quality_table.json")
    table = json.load(open(table_path)) if os.path.exists(table_path) else {}
    table["fusion"] = {
        "protocol": ("identical FusionDataset samples/labels and seed-0 80/20 "
                     "permutation split; reference row = the reference's own "
                     "fusion_model.py + train_multimodal.py recipe run to "
                     "best-F1-class-1 with patience 15; jax rows = committed "
                     "full-scale FusionTrainer runs (training_history_fixed"
                     ".json), best epoch by the same criterion"),
        "rows": {
            "reference_recipe_torch": best,
            "jax_trainer_default": jax_best_row(os.path.join(
                REPO, "artifacts/checkpoints/training_history_fixed.json")),
            "jax_trainer_balanced": jax_best_row(os.path.join(
                REPO, "artifacts/checkpoints_balanced/training_history_fixed.json")),
        },
    }
    with open(table_path, "w") as f:
        json.dump(table, f, indent=2)
    with open(os.path.join(REPO, "artifacts/fusion_anchor_history.json"), "w") as f:
        json.dump(history, f, indent=2)
    print(json.dumps(table["fusion"]["rows"], indent=2))


if __name__ == "__main__":
    main()
