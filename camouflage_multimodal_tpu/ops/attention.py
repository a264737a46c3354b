"""Multi-head cross-attention with torch ``nn.MultiheadAttention`` semantics.

Replaces the cuDNN-backed attention of the reference fusion model
(``/root/reference/models/multimodal/fusion_model.py:33-46,112-131``),
including the head-averaged attention-weight output the reference exposes
through its API (``need_weights=True, average_attn_weights=True``).

Two implementations share one parameter layout:

* ``multihead_attention`` — pure jnp; XLA fuses it fine at the reference's
  sizes (≤512 queries × 13 keys). Used for training (autodiff) and CPU tests.
* a Pallas fused kernel in :mod:`camouflage_multimodal_tpu.ops.pallas_attention`
  used on the TPU inference path.

Parameter layout (dict of arrays):
  wq, wk, wv, wo: (E, E) kernels applied as ``x @ w`` (note: transposed
  relative to torch's ``Linear.weight``), bq, bk, bv, bo: (E,).
Validated against torch.nn.MultiheadAttention in tests (weights copied).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def multihead_attention(
    params: Dict[str, jnp.ndarray],
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Args:
      query: (B, Nq, E); key/value: (B, Nk, E)
      key_mask: (B, Nk) bool — True for valid keys
    Returns:
      output (B, Nq, E), head-averaged attention weights (B, Nq, Nk)
      (the pre-dropout softmax probabilities, like torch's return value).
    """
    B, Nq, E = query.shape
    Nk = key.shape[1]
    hd = E // num_heads
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, query.dtype))

    def proj(x, w, b, n):
        y = jnp.einsum("bne,ef->bnf", x, w, precision="highest") + b
        return y.reshape(B, n, num_heads, hd).transpose(0, 2, 1, 3)

    q = proj(query, params["wq"], params["bq"], Nq) * scale
    k = proj(key, params["wk"], params["bk"], Nk)
    v = proj(value, params["wv"], params["bv"], Nk)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest")
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)

    attn = probs
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        attn = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision="highest")
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, E)
    out = jnp.einsum("bne,ef->bnf", out, params["wo"], precision="highest") + params["bo"]
    return out, jnp.mean(probs, axis=1)


def init_mha_params(rng: jax.Array, embed_dim: int) -> Dict[str, jnp.ndarray]:
    """Xavier-uniform init matching torch MultiheadAttention's in_proj."""
    keys = jax.random.split(rng, 4)
    init = jax.nn.initializers.glorot_uniform()
    return {
        "wq": init(keys[0], (embed_dim, embed_dim)),
        "wk": init(keys[1], (embed_dim, embed_dim)),
        "wv": init(keys[2], (embed_dim, embed_dim)),
        "wo": init(keys[3], (embed_dim, embed_dim)),
        "bq": jnp.zeros(embed_dim),
        "bk": jnp.zeros(embed_dim),
        "bv": jnp.zeros(embed_dim),
        "bo": jnp.zeros(embed_dim),
    }
