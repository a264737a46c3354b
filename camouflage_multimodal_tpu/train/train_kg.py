"""Knowledge-graph GNN trainer + category embedding extraction.

Behavioral port of ``train_kg_gnn`` / ``create_dataset_from_neo4j``
(``/root/reference/models/knowledge_graph/train_model.py:348-431``) and the
embedding factory (``extract_kg_embeddings.py:25-124``): Adam(lr=1e-3,
L2 wd=1e-5), MSE on camouflage_score, ReduceLROnPlateau(patience=5),
grad clip 1.0, 50 epochs, batch 32, 80/20 split, best-val checkpoint; then
per category, mean of ``get_embedding`` over ≤10 subgraphs → one [1,128]
vector, plus the MAE prediction self-test and the pairwise cosine-separation
report.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from camouflage_multimodal_tpu.core.checkpoint import save_checkpoint
from camouflage_multimodal_tpu.kg.featurize import build_subgraph, pad_subgraphs
from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore
from camouflage_multimodal_tpu.models.knowledge_graph import KnowledgeGraphGNN
from camouflage_multimodal_tpu.train.state import TrainState, apply_updates, make_adam_l2_tx


def create_dataset_from_store(store: CamouflageKnowledgeStore,
                              limit_per_category: int = 50) -> List[dict]:
    """All category subgraphs (train_model.py:348-369)."""
    subgraphs = []
    for category, _ in store.categories():
        for rec in store.extract_category_subgraphs(category, limit=limit_per_category):
            subgraphs.append(build_subgraph(rec))
    return subgraphs


class KGTrainer:
    def __init__(self, model: Optional[KnowledgeGraphGNN] = None,
                 max_nodes: int = 64, learning_rate: float = 1e-3,
                 weight_decay: float = 1e-5) -> None:
        self.model = model or KnowledgeGraphGNN()
        self.max_nodes = max_nodes
        self.base_lr = learning_rate
        self.tx = make_adam_l2_tx(weight_decay)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._embed = jax.jit(
            lambda variables, x, adj, mask: self.model.apply(variables, x, adj, mask)["embedding"]
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        N = self.max_nodes
        dummy = (jnp.zeros((1, N, self.model.in_channels)),
                 jnp.zeros((1, N, N), bool), jnp.ones((1, N), bool))
        variables = self.model.init(rng, *dummy)
        return TrainState(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=self.tx.init(variables["params"]),
                          step=jnp.zeros((), jnp.int32))

    def _train_step_impl(self, state, x, adj, mask, y, lr, dropout_rng):
        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, adj, mask, train=True,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
            )
            loss = jnp.mean((out["score"][:, 0] - y) ** 2)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(self.tx, state, grads, lr, new_batch_stats=new_bs)
        return new_state, loss

    def _eval_step_impl(self, state, x, adj, mask, y):
        out = self.model.apply(state.variables, x, adj, mask)
        return jnp.mean((out["score"][:, 0] - y) ** 2)

    # ------------------------------------------------------------------
    # Scan-based epochs (repo convention, same shape as RGTrainer): the
    # padded subgraphs live on device and each epoch is ONE dispatched
    # lax.scan over shuffled batch indices — the host sees one loss array
    # per epoch instead of a float() sync per step.
    # ------------------------------------------------------------------

    def _epoch_impl(self, train: bool, state: TrainState, data, order,
                    lr, dropout_key):
        def step(carry, idx):
            st, key = carry
            key, sub = jax.random.split(key)
            args = tuple(jnp.take(data[k], idx, axis=0)
                         for k in ("x", "adj", "mask", "y"))
            if train:
                st, loss = self._train_step_impl(st, *args, lr, sub)
            else:
                loss = self._eval_step_impl(st, *args)
            return (st, key), loss

        (state, _), losses = jax.lax.scan(step, (state, dropout_key), order)
        return state, losses

    @staticmethod
    def _make_order(rng, indices, batch_size, shuffle):
        order = rng.permutation(indices) if shuffle else np.asarray(indices)
        if len(order) >= batch_size:
            steps = len(order) // batch_size
            if len(order) - steps * batch_size:  # tail window keeps every sample
                order = np.concatenate([order[: steps * batch_size],
                                        order[-batch_size:]])
                steps += 1
            return jnp.asarray(order[: steps * batch_size]
                               .reshape(steps, batch_size).astype(np.int32))
        return jnp.asarray(order[None, :].astype(np.int32))

    def fit(self, subgraphs: List[dict], epochs: int = 50, batch_size: int = 32,
            train_split: float = 0.8, seed: int = 0,
            checkpoint_path: Optional[str] = "kg_gnn_model.ckpt",
            resume_from: Optional[str] = None,
            resume_path: Optional[str] = None,
            log_fn=print) -> Tuple[TrainState, Dict[str, List[float]]]:
        import functools

        from camouflage_multimodal_tpu.core.checkpoint import (
            load_resume_checkpoint, save_resume_checkpoint)

        rng = np.random.default_rng(seed)
        x, adj, mask, y, truncated = pad_subgraphs(subgraphs, self.max_nodes)
        if truncated:
            log_fn(f"warning: {truncated} subgraphs truncated to {self.max_nodes} nodes")
        n = len(subgraphs)
        perm = rng.permutation(n)
        n_train = int(train_split * n)
        tr, va = perm[:n_train], perm[n_train:]
        data = {"x": jnp.asarray(x), "adj": jnp.asarray(adj),
                "mask": jnp.asarray(mask), "y": jnp.asarray(y)}

        state = self.init_state(jax.random.PRNGKey(seed))
        dropout_key = jax.random.PRNGKey(seed + 1)
        history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
        best_val = float("inf")
        lr = self.base_lr
        plateau = 0
        start_epoch = 0
        if resume_from:
            blob = load_resume_checkpoint(resume_from, state_template=state)
            ts = blob["train_state"]
            state = TrainState(params=ts["params"], batch_stats=ts["batch_stats"],
                               opt_state=ts["opt_state"],
                               step=jnp.asarray(ts["step"]))
            rng.bit_generator.state = blob["numpy_rng_state"]
            dropout_key = jnp.asarray(blob["dropout_key"])
            history = blob["history"]
            best_val = blob["best_val"]
            lr = blob.get("lr", lr)
            plateau = blob.get("plateau", 0)
            start_epoch = blob["epoch"] + 1
            log_fn(f"resumed from {resume_from} at epoch {start_epoch}")

        train_epoch = jax.jit(functools.partial(self._epoch_impl, True),
                              donate_argnums=(0,))
        eval_epoch = jax.jit(functools.partial(self._epoch_impl, False))

        for epoch in range(start_epoch, epochs):
            dropout_key, sub = jax.random.split(dropout_key)
            state, tr_losses = train_epoch(
                state, data, self._make_order(rng, tr, batch_size, True),
                jnp.asarray(lr, jnp.float32), sub)
            tr_loss = float(jnp.mean(tr_losses))
            if len(va):
                _, va_losses = eval_epoch(
                    state, data, self._make_order(rng, va, batch_size, False),
                    jnp.asarray(lr, jnp.float32), sub)
                va_loss = float(jnp.mean(va_losses))
            else:
                va_loss = tr_loss
            history["train_loss"].append(tr_loss)
            history["val_loss"].append(va_loss)
            log_fn(f"Epoch {epoch + 1}/{epochs} | Train: {tr_loss:.4f} | Val: {va_loss:.4f}")

            # ReduceLROnPlateau('min', patience=5, factor=0.1) semantics
            if va_loss < best_val - 1e-8:
                plateau = 0
            else:
                plateau += 1
                if plateau > 5:
                    lr *= 0.1
                    plateau = 0

            if va_loss < best_val:
                best_val = va_loss
                if checkpoint_path:
                    save_checkpoint(checkpoint_path, {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "embedding_dim": self.model.embedding_dim,
                        "epoch": epoch,
                        "val_loss": va_loss,
                    })
            if resume_path:
                save_resume_checkpoint(
                    resume_path, state, epoch=epoch, numpy_rng=rng,
                    dropout_key=dropout_key, history=history,
                    best_val=best_val, extra={"lr": lr, "plateau": plateau})
        return state, history

    # ------------------------------------------------------------------
    # Embedding factory (extract_kg_embeddings.py)
    # ------------------------------------------------------------------

    def extract_category_embedding(self, state: TrainState,
                                   store: CamouflageKnowledgeStore,
                                   category: str, limit: int = 10) -> Optional[np.ndarray]:
        records = store.extract_category_subgraphs(category, limit=limit)
        if not records:
            return None
        sgs = [build_subgraph(r) for r in records]
        x, adj, mask, _, _ = pad_subgraphs(sgs, self.max_nodes)
        emb = self._embed(state.variables, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(mask))
        return np.asarray(jnp.mean(emb, axis=0, keepdims=True))

    def batch_extract_embeddings(self, state: TrainState,
                                 store: CamouflageKnowledgeStore,
                                 limit: int = 10) -> Tuple[Dict[str, np.ndarray], Dict[str, dict]]:
        embeddings: Dict[str, np.ndarray] = {}
        stats: Dict[str, dict] = {}
        for category, count in store.categories():
            emb = self.extract_category_embedding(state, store, category, limit)
            if emb is None:
                continue
            embeddings[category] = emb
            stats[category] = {
                "organism_count": count,
                "embedding_norm": float(np.linalg.norm(emb)),
                "embedding_mean": float(emb.mean()),
                "embedding_std": float(emb.std()),
            }
        return embeddings, stats

    def test_model_predictions(self, state: TrainState,
                               store: CamouflageKnowledgeStore,
                               num_categories: int = 5, limit: int = 5) -> Dict[str, float]:
        """MAE self-test per category (extract_kg_embeddings.py:130-173)."""
        maes = {}
        for category, _ in store.categories()[:num_categories]:
            records = store.extract_category_subgraphs(category, limit=limit)
            if not records:
                continue
            sgs = [build_subgraph(r) for r in records]
            x, adj, mask, y, _ = pad_subgraphs(sgs, self.max_nodes)
            out = self.model.apply(state.variables, jnp.asarray(x), jnp.asarray(adj),
                                   jnp.asarray(mask))
            pred = np.asarray(out["score"][:, 0])
            maes[category] = float(np.mean(np.abs(pred - y)))
        return maes


def compare_embeddings(embeddings: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Pairwise cosine-similarity separation report
    (extract_kg_embeddings.py:175-211)."""
    categories = list(embeddings.keys())
    sims = {}
    for i, c1 in enumerate(categories):
        for c2 in categories[i + 1:]:
            a = embeddings[c1].reshape(-1)
            b = embeddings[c2].reshape(-1)
            denom = np.linalg.norm(a) * np.linalg.norm(b)
            sims[f"{c1} vs {c2}"] = float(a @ b / denom) if denom > 0 else 0.0
    return sims
