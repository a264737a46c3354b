"""Multimodal fusion trainer ("fixed" trainer of the reference).

Behavioral port of ``train_multimodal.py`` (:97-509):

* ``SmartMultimodalDataset`` semantics: keep samples whose 3 GT files exist,
  image-level (label, confidence) from the cv2 mask heuristic, edge_label =
  mean(edge_mask) > 10, score_label = mean(mask)/255, ±0.01 Gaussian noise
  augmentation with prob 0.5 (:166-188).
* 5× minority-class oversampling with confidence-scaled weights through a
  WeightedRandomSampler equivalent (:142-164).
* Loss = 3·AggressiveFocal(mask) + 1·CE(instance←mask label) + 0.5·BCE(edge)
  + 0.3·MSE(score), accumulated per-sample then one optimizer step — the
  reference's per-sample backward loop sums gradients (:245-279), so the
  batched equivalent is the SUM of per-sample losses.
* AdamW + CosineAnnealingWarmRestarts(T_0=10,T_mult=2), grad clip 1.0,
  best-checkpoint on val F1-class-1, early stop patience 15 (:459-481).

TPU formulation: variable-node samples are padded into (B, K, 128) buckets
with masks so the whole batch is one jitted step — the reference could not
batch at all (identity collate, per-sample forward).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.core.checkpoint import save_checkpoint
from camouflage_multimodal_tpu.data.labels import extract_label_from_mask
from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector, build_multimodal_model
from camouflage_multimodal_tpu.train.losses import bce_with_logits, focal_loss, weighted_cross_entropy
from camouflage_multimodal_tpu.train.schedules import cosine_warm_restarts
from camouflage_multimodal_tpu.train.state import TrainState, apply_updates, make_adamw_tx


def calculate_f1_score(predictions: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Per-class F1 (train_multimodal.py:197-220, same eps)."""
    predictions = np.asarray(predictions)
    labels = np.asarray(labels)
    tp = float(((predictions == 1) & (labels == 1)).sum())
    fp = float(((predictions == 1) & (labels == 0)).sum())
    fn = float(((predictions == 0) & (labels == 1)).sum())
    tn = float(((predictions == 0) & (labels == 0)).sum())
    precision_1 = tp / (tp + fp + 1e-8)
    recall_1 = tp / (tp + fn + 1e-8)
    f1_1 = 2 * precision_1 * recall_1 / (precision_1 + recall_1 + 1e-8)
    precision_0 = tn / (tn + fn + 1e-8)
    recall_0 = tn / (tn + fp + 1e-8)
    f1_0 = 2 * precision_0 * recall_0 / (precision_0 + recall_0 + 1e-8)
    return {
        "f1_class_0": f1_0, "f1_class_1": f1_1, "f1_avg": (f1_0 + f1_1) / 2,
        "precision_1": precision_1, "recall_1": recall_1,
    }


class FusionDataset:
    """Matched RG/KG samples + GT-derived labels, padded to fixed buckets.

    ``max_rg_nodes`` sizes the padded node bucket. The default 576 is
    lane-aligned (9×64) and covers the reference's own extraction scale —
    its ``embedding_summary.json`` records up to ~525 nodes/image at
    n_segments=500. Pass ``None`` to size the bucket from the data
    (max node count rounded up to a multiple of 64). Any nodes that still
    overflow the bucket are counted in ``truncated_nodes`` /
    ``truncated_samples`` and reported once per collate pass instead of
    being dropped silently.
    """

    def __init__(self, matched_data: List[Dict[str, Any]], mask_dir: str,
                 instance_dir: str, edge_dir: str,
                 max_rg_nodes: Optional[int] = 576,
                 augment: bool = False, seed: int = 0,
                 log_fn=print) -> None:
        from PIL import Image

        self.log_fn = log_fn
        self.truncated_nodes = 0
        self.truncated_samples = 0
        self._warned_truncation = False
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        self.samples: List[Dict[str, Any]] = []
        for sample in matched_data:
            base = os.path.splitext(sample["image_name"])[0]
            mask_path = os.path.join(mask_dir, base + ".png")
            instance_path = os.path.join(instance_dir, base + ".png")
            edge_path = os.path.join(edge_dir, base + ".png")
            if not all(os.path.exists(p) for p in (mask_path, instance_path, edge_path)):
                continue
            label, confidence = extract_label_from_mask(mask_path)
            mask = np.asarray(Image.open(mask_path).convert("L"))
            edge_mask = np.asarray(Image.open(edge_path).convert("L"))
            self.samples.append({
                **sample,
                "label": int(label),
                "confidence": float(confidence),
                "edge_label": float(edge_mask.mean() > 10),
                "score_label": float(mask.mean() / 255.0),
            })
        if max_rg_nodes is None:
            widest = max((int(np.asarray(s["rg_node_embeddings"]).shape[0])
                          for s in self.samples), default=64)
            max_rg_nodes = -(-widest // 64) * 64  # ceil to a 64-lane multiple
        self.max_rg_nodes = int(max_rg_nodes)

    @classmethod
    def from_samples(cls, samples: List[Dict[str, Any]],
                     max_rg_nodes: Optional[int] = 576,
                     augment: bool = False, seed: int = 0,
                     log_fn=print) -> "FusionDataset":
        """Build a dataset from already-labeled sample records (each holding
        rg_node_embeddings / kg_embeddings / label / confidence / edge_label /
        score_label), skipping GT-file scanning. Used by tests and by callers
        that precompute labels."""
        ds = cls.__new__(cls)
        ds.log_fn = log_fn
        ds.truncated_nodes = 0
        ds.truncated_samples = 0
        ds._warned_truncation = False
        ds.augment = augment
        ds.rng = np.random.default_rng(seed)
        ds.samples = list(samples)
        if max_rg_nodes is None:
            widest = max((int(np.asarray(s["rg_node_embeddings"]).shape[0])
                          for s in ds.samples), default=64)
            max_rg_nodes = -(-widest // 64) * 64
        ds.max_rg_nodes = int(max_rg_nodes)
        return ds

    def __len__(self) -> int:
        return len(self.samples)

    def get_labels(self) -> List[int]:
        return [s["label"] for s in self.samples]

    def get_aggressive_sample_weights(self) -> List[float]:
        """5× minority boost × confidence (train_multimodal.py:142-164)."""
        labels = self.get_labels()
        confidences = [s["confidence"] for s in self.samples]
        counts: Dict[int, int] = {}
        for l in labels:
            counts[l] = counts.get(l, 0) + 1
        majority = max(counts.values())
        class_weights = {c: (majority / cnt) * 5.0 if c == 1 else 1.0
                         for c, cnt in counts.items()}
        return [class_weights[labels[i]] * confidences[i] for i in range(len(labels))]

    def get_balanced_sample_weights(self) -> List[float]:
        """Inverse-frequency weights × confidence.

        The reference's "aggressive" sampler (train_multimodal.py:142-164)
        hard-codes class 1 as the minority, but on COD10K-CAM data class 1
        is the MAJORITY — the 5× boost then starves class 0 and collapses
        the classifier toward class 1 (VERDICT r1: val_acc_0 ≈ 31%). This
        variant boosts whichever class is actually rarer.
        """
        labels = self.get_labels()
        confidences = [s["confidence"] for s in self.samples]
        counts: Dict[int, int] = {}
        for l in labels:
            counts[l] = counts.get(l, 0) + 1
        majority = max(counts.values())
        class_weights = {c: majority / cnt for c, cnt in counts.items()}
        return [class_weights[labels[i]] * confidences[i] for i in range(len(labels))]

    def collate(self, indices) -> Dict[str, np.ndarray]:
        """Pad a set of samples into one batch."""
        B = len(indices)
        K = self.max_rg_nodes
        n_kg = self.samples[indices[0]]["kg_embeddings"].shape[0]
        dim = self.samples[indices[0]]["rg_node_embeddings"].shape[1]
        rg = np.zeros((B, K, dim), np.float32)
        rg_mask = np.zeros((B, K), bool)
        kg = np.zeros((B, n_kg, dim), np.float32)
        y = np.zeros((B,), np.int64)
        edge = np.zeros((B,), np.float32)
        score = np.zeros((B,), np.float32)
        for i, idx in enumerate(indices):
            s = self.samples[idx]
            node = np.asarray(s["rg_node_embeddings"], np.float32)
            kge = np.asarray(s["kg_embeddings"], np.float32)
            if self.augment and self.rng.random() > 0.5:
                node = node + self.rng.standard_normal(node.shape).astype(np.float32) * 0.01
                kge = kge + self.rng.standard_normal(kge.shape).astype(np.float32) * 0.01
            n = min(node.shape[0], K)
            if node.shape[0] > K:
                self.truncated_nodes += node.shape[0] - K
                self.truncated_samples += 1
            rg[i, :n] = node[:n]
            rg_mask[i, :n] = True
            kg[i] = kge
            y[i] = s["label"]
            edge[i] = s["edge_label"]
            score[i] = s["score_label"]
        if self.truncated_nodes and not self._warned_truncation:
            self._warned_truncation = True
            self.log_fn(
                f"WARNING: FusionDataset bucket max_rg_nodes={K} is smaller than "
                f"some samples — {self.truncated_nodes} nodes dropped across "
                f"{self.truncated_samples} sample(s) so far. Pass max_rg_nodes=None "
                f"to size the bucket from the data.")
        return {"rg": rg, "rg_mask": rg_mask, "kg": kg, "y": y,
                "edge": edge, "score": score}


class FusionTrainer:
    def __init__(self, model: Optional[MultimodalCamouflageDetector] = None,
                 model_config: Optional[Dict[str, Any]] = None,
                 learning_rate: float = 5e-4, weight_decay: float = 1e-4,
                 task_weights: Optional[Dict[str, float]] = None,
                 balanced: bool = False) -> None:
        self.model = model or build_multimodal_model(model_config or {})
        self.base_lr = learning_rate
        self.tx = make_adamw_tx(weight_decay)
        # Reference hardcoded 3.0/1.0/0.5/0.3 (train_multimodal.py:257-266).
        self.w = task_weights or {"mask": 3.0, "instance": 1.0, "edge": 0.5, "score": 0.3}
        # balanced=True replaces the reference's class-1-boosting sampler +
        # focal alpha with data-driven inverse-frequency forms (see
        # FusionDataset.get_balanced_sample_weights). Off by default: the
        # default run reproduces the reference recipe exactly.
        self.balanced = balanced
        self.focal_alpha = 0.75  # reference AggressiveFocalLoss alpha
        # Data-parallel mesh; set via fit(mesh=) before the epoch jits trace.
        self.mesh = None
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    def _constrain_batch(self, batch):
        """Pin the batch axis to the mesh's ``data`` axis (GSPMD shards the
        step, all-reduces grads over ICI)."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        def pin(x):
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(pin, batch)

    def init_state(self, rng: jax.Array, rg_dim: int = 128, n_kg: int = 13,
                   max_rg_nodes: int = 512) -> TrainState:
        dummy_rg = jnp.zeros((1, max_rg_nodes, rg_dim))
        dummy_kg = jnp.zeros((1, n_kg, rg_dim))
        variables = self.model.init(rng, dummy_rg, dummy_kg)
        params = variables["params"]
        return TrainState(params=params, batch_stats={},
                          opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _losses(self, out, batch, focal_alpha):
        B = batch["y"].shape[0]
        per_mask = jax.vmap(lambda lo, la: focal_loss(
            lo[None], la[None], alpha=focal_alpha))(
            out["mask_logits"], batch["y"])
        per_inst = jax.vmap(lambda lo, la: weighted_cross_entropy(lo[None], la[None]))(
            out["instance_logits"], batch["y"])
        per_edge = jax.vmap(lambda lo, la: bce_with_logits(lo, la))(
            out["edge_logits"][:, 0], batch["edge"])
        per_score = jax.vmap(lambda p, t: jnp.mean((p - t) ** 2))(
            out["score"][:, 0], batch["score"])
        # SUM over samples = the reference's per-sample grad accumulation.
        total = jnp.sum(self.w["mask"] * per_mask + self.w["instance"] * per_inst
                        + self.w["edge"] * per_edge + self.w["score"] * per_score)
        return total

    def _sample_weights(self, dataset: "FusionDataset",
                        train_idx: np.ndarray) -> np.ndarray:
        """Oversampling weights; in balanced mode also sets the focal alpha
        to the class-0 share of the train split (class-balanced alpha_t),
        before the first train-step trace."""
        if not self.balanced:
            return np.asarray(dataset.get_aggressive_sample_weights())
        labels = np.asarray(dataset.get_labels())
        self.focal_alpha = float(np.clip(1.0 - labels[train_idx].mean(),
                                         0.05, 0.95))
        return np.asarray(dataset.get_balanced_sample_weights())

    def _train_step_impl(self, state, batch, lr, dropout_rng, focal_alpha):
        # focal_alpha is a TRACED scalar (not read from self at trace time):
        # balanced mode recomputes it per fit() and a cached jit trace must
        # not bake in a stale value (advisor round-2 finding).
        def loss_fn(params):
            out = self.model.apply(
                {"params": params}, batch["rg"], batch["kg"],
                rg_mask=batch["rg_mask"], train=True, rngs={"dropout": dropout_rng},
            )
            total = self._losses(out, batch, focal_alpha)
            preds = jnp.argmax(out["mask_logits"], -1)
            return total, preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(self.tx, state, grads, lr)
        return new_state, loss, preds

    def _eval_step_impl(self, state, batch):
        out = self.model.apply({"params": state.params}, batch["rg"], batch["kg"],
                               rg_mask=batch["rg_mask"])
        # Validation uses plain CE (train_multimodal.py:312,323)
        per_ce = jax.vmap(lambda lo, la: weighted_cross_entropy(lo[None], la[None]))(
            out["mask_logits"], batch["y"])
        preds = jnp.argmax(out["mask_logits"], -1)
        return jnp.sum(per_ce), preds

    # ------------------------------------------------------------------
    # Scan-based epochs (mirrors RGTrainer): the padded sample tensors live
    # on device once; an epoch of oversampled batches is one lax.scan
    # dispatch. Noise augmentation (train_multimodal.py:173-175) runs on
    # device with the scan-carried PRNG.
    # ------------------------------------------------------------------

    def _device_dataset(self, dataset: "FusionDataset") -> Dict[str, jnp.ndarray]:
        idx = list(range(len(dataset)))
        # Host-side augmentation must NOT bake a frozen noise realization
        # into the device-resident copy — scan epochs apply fresh device-side
        # noise per epoch in _epoch_impl (and leaving it on would also
        # consume the dataset RNG, breaking run-to-run reproducibility).
        saved = dataset.augment
        dataset.augment = False
        try:
            cols = dataset.collate(idx)
        finally:
            dataset.augment = saved
        return {k: jnp.asarray(v) for k, v in cols.items()}

    def _epoch_impl(self, train: bool, augment: bool, state: TrainState,
                    data, order, lr, key, focal_alpha):
        def step(carry, idx):
            st, k = carry
            k, k_flip, k1, k2, k_drop = jax.random.split(k, 5)
            batch = {name: jnp.take(data[name], idx, axis=0)
                     for name in ("rg", "rg_mask", "kg", "y", "edge", "score")}
            if augment:
                B = idx.shape[0]
                flips = jax.random.uniform(k_flip, (B,)) > 0.5
                rg_noise = jax.random.normal(k1, batch["rg"].shape) * 0.01
                kg_noise = jax.random.normal(k2, batch["kg"].shape) * 0.01
                batch["rg"] = batch["rg"] + rg_noise * flips[:, None, None]
                batch["kg"] = batch["kg"] + kg_noise * flips[:, None, None]
            batch = self._constrain_batch(batch)
            if train:
                st, loss, preds = self._train_step_impl(st, batch, lr, k_drop,
                                                        focal_alpha)
            else:
                loss, preds = self._eval_step_impl(st, batch)
            return (st, k), (loss, preds, batch["y"])

        (state, _), (losses, preds, ys) = jax.lax.scan(step, (state, key), order)
        return state, losses, preds, ys

    def fit(self, dataset: "FusionDataset", epochs: int = 30, batch_size: int = 4,
            train_split: float = 0.8, seed: int = 0,
            checkpoint_dir: Optional[str] = None, max_patience: int = 15,
            config: Optional[Dict[str, Any]] = None, use_scan: bool = False,
            resume_from: Optional[str] = None, resume_path: Optional[str] = None,
            mesh=None,
            log_fn=print) -> Tuple[TrainState, Dict[str, List[float]]]:
        if mesh is not None and not use_scan:
            use_scan = True  # the mesh path rides the device-resident epochs
        if use_scan:
            return self._fit_scan(dataset, epochs, batch_size, train_split, seed,
                                  checkpoint_dir, max_patience, config, log_fn,
                                  resume_from=resume_from, resume_path=resume_path,
                                  mesh=mesh)
        return self._fit_loop(dataset, epochs, batch_size, train_split, seed,
                              checkpoint_dir, max_patience, config, log_fn)

    def _fit_scan(self, dataset, epochs, batch_size, train_split, seed,
                  checkpoint_dir, max_patience, config, log_fn,
                  resume_from=None, resume_path=None, mesh=None):
        import functools

        from camouflage_multimodal_tpu.core.checkpoint import (
            load_resume_checkpoint, save_resume_checkpoint)

        rng = np.random.default_rng(seed)
        n = len(dataset)
        perm = rng.permutation(n)
        n_train = int(train_split * n)
        train_idx, val_idx = perm[:n_train], perm[n_train:]

        weights = self._sample_weights(dataset, train_idx)
        p = weights[train_idx] / weights[train_idx].sum()

        first = dataset.samples[0]
        state = self.init_state(
            jax.random.PRNGKey(seed),
            rg_dim=first["rg_node_embeddings"].shape[1],
            n_kg=first["kg_embeddings"].shape[0],
            max_rg_nodes=dataset.max_rg_nodes,
        )
        key = jax.random.PRNGKey(seed + 1)
        data = self._device_dataset(dataset)

        self.mesh = mesh
        if mesh is not None:
            from camouflage_multimodal_tpu.parallel.sharding import (
                replicate, shard_batch)

            n_data = mesh.shape["data"]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"data axis ({n_data})")
            data = shard_batch(data, mesh)
            state = replicate(state, mesh)
            key = replicate(key, mesh)

        train_epoch = jax.jit(functools.partial(self._epoch_impl, True, True),
                              donate_argnums=(0,))
        eval_epoch = jax.jit(functools.partial(self._epoch_impl, False, False))

        def order_of(indices):
            steps = max(len(indices) // batch_size, 1)
            cut = indices[: steps * batch_size]
            return jnp.asarray(np.asarray(cut, np.int32).reshape(steps, -1))

        history: Dict[str, List[float]] = {k: [] for k in (
            "train_loss", "val_loss", "train_f1_class_0", "train_f1_class_1",
            "train_f1_avg", "val_f1_class_0", "val_f1_class_1", "val_f1_avg",
            "val_acc_0", "val_acc_1")}
        best_f1 = 0.0
        patience = 0
        val_order = order_of(val_idx)
        start_epoch = 0
        if resume_from:
            blob = load_resume_checkpoint(resume_from, state_template=state)
            ts = blob["train_state"]
            state = TrainState(params=ts["params"], batch_stats=ts["batch_stats"],
                               opt_state=ts["opt_state"],
                               step=jnp.asarray(ts["step"]))
            rng.bit_generator.state = blob["numpy_rng_state"]
            key = jnp.asarray(blob["dropout_key"])
            history = blob["history"]
            best_f1 = blob["best_val"]
            patience = blob.get("patience", 0)
            start_epoch = blob["epoch"] + 1
            log_fn(f"resumed from {resume_from} at epoch {start_epoch}")

        for epoch in range(start_epoch, epochs):
            lr = cosine_warm_restarts(epoch, self.base_lr, T_0=10, T_mult=2)
            sampled = rng.choice(train_idx, size=len(train_idx), replace=True, p=p)
            key, sub = jax.random.split(key)
            state, losses, preds, ys = train_epoch(
                state, data, order_of(sampled), jnp.asarray(lr, jnp.float32), sub,
                jnp.asarray(self.focal_alpha, jnp.float32))
            tr_preds = np.asarray(preds).reshape(-1)
            tr_ys = np.asarray(ys).reshape(-1)
            train_f1 = calculate_f1_score(tr_preds, tr_ys)
            train_loss = float(np.sum(np.asarray(losses))) / max(len(tr_preds), 1)

            _, vlosses, vpreds, vys = eval_epoch(
                state, data, val_order, jnp.asarray(lr, jnp.float32), sub,
                jnp.asarray(self.focal_alpha, jnp.float32))
            va_preds = np.asarray(vpreds).reshape(-1)
            va_ys = np.asarray(vys).reshape(-1)
            val_f1 = calculate_f1_score(va_preds, va_ys)
            val_loss = float(np.sum(np.asarray(vlosses))) / max(len(va_preds), 1)

            acc_0 = 100.0 * ((va_preds == va_ys) & (va_ys == 0)).sum() / max((va_ys == 0).sum(), 1)
            acc_1 = 100.0 * ((va_preds == va_ys) & (va_ys == 1)).sum() / max((va_ys == 1).sum(), 1)

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["train_f1_class_0"].append(train_f1["f1_class_0"])
            history["train_f1_class_1"].append(train_f1["f1_class_1"])
            history["train_f1_avg"].append(train_f1["f1_avg"])
            history["val_f1_class_0"].append(val_f1["f1_class_0"])
            history["val_f1_class_1"].append(val_f1["f1_class_1"])
            history["val_f1_avg"].append(val_f1["f1_avg"])
            history["val_acc_0"].append(acc_0)
            history["val_acc_1"].append(acc_1)
            log_fn(f"Epoch {epoch + 1}/{epochs} Train: Loss={train_loss:.4f} "
                   f"F1_C1={train_f1['f1_class_1']:.3f} | Val: Loss={val_loss:.4f} "
                   f"F1_C1={val_f1['f1_class_1']:.3f} Acc0={acc_0:.1f}% Acc1={acc_1:.1f}%")

            if val_f1["f1_class_1"] > best_f1:
                best_f1 = val_f1["f1_class_1"]
                patience = 0
                if checkpoint_dir:
                    save_checkpoint(os.path.join(checkpoint_dir, "multimodal_best_fixed.ckpt"), {
                        "epoch": epoch, "params": state.params,
                        "opt_state": state.opt_state, "val_loss": val_loss,
                        "val_f1_class_1": val_f1["f1_class_1"],
                        "val_f1_avg": val_f1["f1_avg"],
                        "val_acc_0": acc_0, "val_acc_1": acc_1,
                        "config": config or {},
                    })
            else:
                patience += 1
                if patience >= max_patience:
                    log_fn(f"Early stopping after {patience} epochs")
                    break
            if resume_path:
                save_resume_checkpoint(resume_path, state, epoch=epoch,
                                       numpy_rng=rng, dropout_key=key,
                                       history=history, best_val=best_f1,
                                       extra={"patience": patience})

        if checkpoint_dir:
            with open(os.path.join(checkpoint_dir, "training_history_fixed.json"), "w") as f:
                json.dump(history, f, indent=2)
        return state, history

    def _fit_loop(self, dataset: FusionDataset, epochs: int = 30, batch_size: int = 4,
                  train_split: float = 0.8, seed: int = 0,
                  checkpoint_dir: Optional[str] = None, max_patience: int = 15,
                  config: Optional[Dict[str, Any]] = None,
                  log_fn=print) -> Tuple[TrainState, Dict[str, List[float]]]:
        rng = np.random.default_rng(seed)
        n = len(dataset)
        perm = rng.permutation(n)
        n_train = int(train_split * n)
        train_idx, val_idx = perm[:n_train], perm[n_train:]

        weights = self._sample_weights(dataset, train_idx)
        train_weights = weights[train_idx]
        p = train_weights / train_weights.sum()

        first = dataset.samples[0]
        state = self.init_state(
            jax.random.PRNGKey(seed),
            rg_dim=first["rg_node_embeddings"].shape[1],
            n_kg=first["kg_embeddings"].shape[0],
            max_rg_nodes=dataset.max_rg_nodes,
        )
        dropout_key = jax.random.PRNGKey(seed + 1)

        history: Dict[str, List[float]] = {k: [] for k in (
            "train_loss", "val_loss", "train_f1_class_0", "train_f1_class_1",
            "train_f1_avg", "val_f1_class_0", "val_f1_class_1", "val_f1_avg",
            "val_acc_0", "val_acc_1")}
        best_f1 = 0.0
        patience = 0

        for epoch in range(epochs):
            lr = cosine_warm_restarts(epoch, self.base_lr, T_0=10, T_mult=2)
            # WeightedRandomSampler(len(train), replacement=True)
            sampled = rng.choice(train_idx, size=len(train_idx), replace=True, p=p)
            all_preds, all_labels, total_loss = [], [], 0.0
            for i in range(0, len(sampled), batch_size):
                idx = sampled[i: i + batch_size]
                batch = {k: jnp.asarray(v) for k, v in dataset.collate(idx).items()}
                dropout_key, sub = jax.random.split(dropout_key)
                state, loss, preds = self._train_step(
                    state, batch, jnp.asarray(lr, jnp.float32), sub,
                    jnp.asarray(self.focal_alpha, jnp.float32))
                total_loss += float(loss)
                all_preds.extend(np.asarray(preds).tolist())
                all_labels.extend(np.asarray(batch["y"]).tolist())
            train_f1 = calculate_f1_score(np.asarray(all_preds), np.asarray(all_labels))
            train_loss = total_loss / max(len(all_preds), 1)

            va_preds, va_labels, va_loss = [], [], 0.0
            for i in range(0, len(val_idx), batch_size):
                idx = val_idx[i: i + batch_size]
                batch = {k: jnp.asarray(v) for k, v in dataset.collate(idx).items()}
                loss, preds = self._eval_step(state, batch)
                va_loss += float(loss)
                va_preds.extend(np.asarray(preds).tolist())
                va_labels.extend(np.asarray(batch["y"]).tolist())
            val_f1 = calculate_f1_score(np.asarray(va_preds), np.asarray(va_labels))
            val_loss = va_loss / max(len(va_preds), 1)

            va_labels_np = np.asarray(va_labels)
            va_preds_np = np.asarray(va_preds)
            acc_0 = 100.0 * ((va_preds_np == va_labels_np) & (va_labels_np == 0)).sum() / max((va_labels_np == 0).sum(), 1)
            acc_1 = 100.0 * ((va_preds_np == va_labels_np) & (va_labels_np == 1)).sum() / max((va_labels_np == 1).sum(), 1)

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["train_f1_class_0"].append(train_f1["f1_class_0"])
            history["train_f1_class_1"].append(train_f1["f1_class_1"])
            history["train_f1_avg"].append(train_f1["f1_avg"])
            history["val_f1_class_0"].append(val_f1["f1_class_0"])
            history["val_f1_class_1"].append(val_f1["f1_class_1"])
            history["val_f1_avg"].append(val_f1["f1_avg"])
            history["val_acc_0"].append(acc_0)
            history["val_acc_1"].append(acc_1)

            log_fn(f"Epoch {epoch + 1}/{epochs} Train: Loss={train_loss:.4f} "
                   f"F1_C1={train_f1['f1_class_1']:.3f} | Val: Loss={val_loss:.4f} "
                   f"F1_C1={val_f1['f1_class_1']:.3f} Acc0={acc_0:.1f}% Acc1={acc_1:.1f}%")

            if val_f1["f1_class_1"] > best_f1:
                best_f1 = val_f1["f1_class_1"]
                patience = 0
                if checkpoint_dir:
                    save_checkpoint(os.path.join(checkpoint_dir, "multimodal_best_fixed.ckpt"), {
                        "epoch": epoch,
                        "params": state.params,
                        "opt_state": state.opt_state,
                        "val_loss": val_loss,
                        "val_f1_class_1": val_f1["f1_class_1"],
                        "val_f1_avg": val_f1["f1_avg"],
                        "val_acc_0": acc_0,
                        "val_acc_1": acc_1,
                        "config": config or {},
                    })
            else:
                patience += 1
                if patience >= max_patience:
                    log_fn(f"Early stopping after {patience} epochs")
                    break

        if checkpoint_dir:
            with open(os.path.join(checkpoint_dir, "training_history_fixed.json"), "w") as f:
                json.dump(history, f, indent=2)
        return state, history
