"""Loss functions with exact torch semantics (validated against torch in
tests).

* :func:`weighted_cross_entropy` — ``nn.CrossEntropyLoss(weight=...)``:
  weighted mean, normalized by the *sum of per-sample class weights*
  (reference RG trainer, ``region_graph/train.py:325-326``).
* :func:`bce_with_logits` — ``nn.BCEWithLogitsLoss(pos_weight=...)``:
  plain mean of pos-weighted per-element losses (train.py:327).
* :func:`focal_loss` — ``AggressiveFocalLoss(alpha=0.75, gamma=3.0)``
  (``train_multimodal.py:29-57``): CE-based, alpha on class 1.

All take an optional validity mask so padded nodes/samples drop out of the
reduction exactly as they would under the reference's unpadded batches.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _masked(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return x
    return jnp.where(mask, x, 0.0)


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: Optional[Sequence[float]] = None,
                           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits (..., C), labels (...,) int, mask (...,) bool."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=logits.dtype)[labels]
    else:
        w = jnp.ones_like(nll)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: float = 1.0,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-element pos-weighted BCE, mean over (valid) elements."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    if mask is None:
        return jnp.mean(loss)
    loss = jnp.where(mask, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, alpha: float = 0.75,
               gamma: float = 3.0, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """AggressiveFocalLoss: mean over samples of
    alpha_t · (1 − p_t)^gamma · CE, alpha_t = alpha for class 1 else 1−alpha."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    alpha_t = jnp.where(labels == 1, alpha, 1.0 - alpha)
    loss = alpha_t * (1.0 - pt) ** gamma * ce
    if mask is None:
        return jnp.mean(loss)
    loss = jnp.where(mask, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def mse(pred: jnp.ndarray, target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    loss = (pred - target) ** 2
    if mask is None:
        return jnp.mean(loss)
    loss = jnp.where(mask, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)
