"""Multimodal fusion: cross-attention / late fusion + 4-head detector.

Behavioral port of ``/root/reference/models/multimodal/fusion_model.py``:

* :class:`CrossAttentionFusion` (fusion_model.py:16-146): bidirectional
  cross-attention (RG↔KG, 8 heads), post-attention LayerNorm residual, FFN
  residual, mean-pool both streams, concat → 2-layer fusion MLP; returns the
  head-averaged attention maps {'rg2kg','kg2rg'} through the API.
* :class:`LateFusion` (fusion_model.py:149-171): mean-pool + concat → MLP.
* :class:`MultimodalCamouflageDetector` (fusion_model.py:174-246): fusion +
  mask/instance/edge heads and a sigmoid score head.
* :func:`build_multimodal_model` (fusion_model.py:249-259): config factory
  with the same keys/defaults.

TPU formulation: the reference's per-sample loop (variable RG node counts →
batch of size 1, train_multimodal.py:245) becomes padded (B, K, 128) inputs
with validity masks; pooling is masked mean, attention masks padded keys.
With all nodes valid this reduces exactly to the reference computation
(validated against a torch implementation in tests).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.ops.attention import multihead_attention
from camouflage_multimodal_tpu.ops.graph import masked_mean_pool


class _MHA(nn.Module):
    """flax wrapper holding torch-layout MHA parameters.

    ``use_pallas=True`` routes deterministic (inference) calls through the
    fused Pallas kernel (ops/pallas_attention.py); training keeps the jnp
    path for autodiff + attention dropout."""

    embed_dim: int
    num_heads: int
    dropout: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q, k, v, key_mask, deterministic: bool):
        init = nn.initializers.glorot_uniform()
        params = {
            "wq": self.param("wq", init, (self.embed_dim, self.embed_dim)),
            "wk": self.param("wk", init, (self.embed_dim, self.embed_dim)),
            "wv": self.param("wv", init, (self.embed_dim, self.embed_dim)),
            "wo": self.param("wo", init, (self.embed_dim, self.embed_dim)),
            "bq": self.param("bq", nn.initializers.zeros, (self.embed_dim,)),
            "bk": self.param("bk", nn.initializers.zeros, (self.embed_dim,)),
            "bv": self.param("bv", nn.initializers.zeros, (self.embed_dim,)),
            "bo": self.param("bo", nn.initializers.zeros, (self.embed_dim,)),
        }
        if self.use_pallas and (deterministic or self.dropout == 0.0):
            # Fused kernel with a custom VJP (recompute backward), so it also
            # serves dropout-free training; attention-probs dropout (the
            # torch-MHA training behavior) keeps the jnp path below.
            from camouflage_multimodal_tpu.ops.pallas_attention import (
                pallas_multihead_attention_trainable,
            )

            mask = key_mask
            if mask is None:
                mask = jnp.ones(k.shape[:2], dtype=bool)
            return pallas_multihead_attention_trainable(params, q, k, v,
                                                        self.num_heads, mask)
        rng = None
        rate = 0.0
        if not deterministic and self.dropout > 0:
            rng = self.make_rng("dropout")
            rate = self.dropout
        return multihead_attention(params, q, k, v, self.num_heads,
                                   key_mask=key_mask, dropout_rate=rate,
                                   dropout_rng=rng)


class _FFN(nn.Module):
    hidden_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        y = nn.relu(nn.Dense(self.hidden_dim * 2, name="fc1")(x))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.Dense(self.hidden_dim, name="fc2")(y)


class CrossAttentionFusion(nn.Module):
    rg_dim: int = 128
    kg_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 8
    dropout: float = 0.3
    use_pallas: bool = False

    @nn.compact
    def __call__(self, rg, kg, rg_mask=None, kg_mask=None, train: bool = False):
        """rg: (B, Nrg, rg_dim), kg: (B, Nkg, kg_dim); 2-D inputs get a
        singleton token axis (reference fusion_model.py:86-89). Masks default
        to all-valid. Returns (fused (B, hidden), {'rg2kg','kg2rg'})."""
        deterministic = not train

        def collapse_to_3d(t):
            """2D → add token axis; 4D → squeeze/merge (the reference's
            accidental-4D shim, fusion_model.py:91-105)."""
            if t.ndim == 2:
                return t[:, None, :]
            if t.ndim == 4:
                b, a, c, d = t.shape
                if a == 1:
                    return t[:, 0]
                if c == 1:
                    return t[:, :, 0]
                return t.reshape(b, a * c, d)
            return t

        rg = collapse_to_3d(rg)
        kg = collapse_to_3d(kg)
        B, Nrg, _ = rg.shape
        Nkg = kg.shape[1]
        if rg_mask is None:
            rg_mask = jnp.ones((B, Nrg), dtype=bool)
        if kg_mask is None:
            kg_mask = jnp.ones((B, Nkg), dtype=bool)

        rg_proj = rg if self.rg_dim == self.hidden_dim else nn.Dense(self.hidden_dim, name="rg_proj")(rg)
        kg_proj = kg if self.kg_dim == self.hidden_dim else nn.Dense(self.hidden_dim, name="kg_proj")(kg)

        rg_att, w_rg2kg = _MHA(self.hidden_dim, self.num_heads, self.dropout,
                               use_pallas=self.use_pallas,
                               name="cross_attn_rg2kg")(rg_proj, kg_proj, kg_proj,
                                                        kg_mask, deterministic)
        rg_att = nn.LayerNorm(name="ln_rg")(rg_proj + rg_att)
        rg_att = rg_att + _FFN(self.hidden_dim, self.dropout, name="ffn_rg")(rg_att, deterministic)

        kg_att, w_kg2rg = _MHA(self.hidden_dim, self.num_heads, self.dropout,
                               use_pallas=self.use_pallas,
                               name="cross_attn_kg2rg")(kg_proj, rg_proj, rg_proj,
                                                        rg_mask, deterministic)
        kg_att = nn.LayerNorm(name="ln_kg")(kg_proj + kg_att)
        kg_att = kg_att + _FFN(self.hidden_dim, self.dropout, name="ffn_kg")(kg_att, deterministic)

        rg_pooled = masked_mean_pool(rg_att, rg_mask)
        kg_pooled = masked_mean_pool(kg_att, kg_mask)

        combined = jnp.concatenate([rg_pooled, kg_pooled], axis=-1)
        fused = nn.relu(nn.Dense(self.hidden_dim, name="fusion_1")(combined))
        fused = nn.Dropout(self.dropout)(fused, deterministic=deterministic)
        fused = nn.Dense(self.hidden_dim, name="fusion_2")(fused)

        return fused, {"rg2kg": w_rg2kg, "kg2rg": w_kg2rg}


class LateFusion(nn.Module):
    rg_dim: int = 128
    kg_dim: int = 128
    hidden_dim: int = 256
    dropout: float = 0.3

    @nn.compact
    def __call__(self, rg, kg, rg_mask=None, kg_mask=None, train: bool = False):
        deterministic = not train
        if rg.ndim == 3:
            rg = masked_mean_pool(rg, rg_mask if rg_mask is not None
                                  else jnp.ones(rg.shape[:2], bool))
        if kg.ndim == 3:
            kg = masked_mean_pool(kg, kg_mask if kg_mask is not None
                                  else jnp.ones(kg.shape[:2], bool))
        x = jnp.concatenate([rg, kg], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(self.hidden_dim // 2, name="fc2")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim // 2, name="fc3")(x)
        return x, None


class MultimodalCamouflageDetector(nn.Module):
    rg_dim: int = 128
    kg_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 8
    fusion_type: str = "cross_attention"
    num_classes: int = 2
    dropout: float = 0.3
    use_pallas: bool = False

    @nn.compact
    def __call__(self, rg, kg, rg_mask=None, kg_mask=None, train: bool = False,
                 return_attention: bool = False):
        if self.fusion_type == "cross_attention":
            fusion = CrossAttentionFusion(self.rg_dim, self.kg_dim, self.hidden_dim,
                                          self.num_heads, self.dropout,
                                          use_pallas=self.use_pallas, name="fusion")
            final_dim = self.hidden_dim
        elif self.fusion_type == "late":
            fusion = LateFusion(self.rg_dim, self.kg_dim, self.hidden_dim,
                                self.dropout, name="fusion")
            final_dim = self.hidden_dim // 2
        else:
            raise ValueError(f"Unknown fusion_type: {self.fusion_type}")

        fused, attn = fusion(rg, kg, rg_mask, kg_mask, train)
        deterministic = not train

        def head(name: str, out_dim: int, sigmoid: bool = False):
            y = nn.relu(nn.Dense(final_dim // 2, name=f"{name}_1")(fused))
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = nn.Dense(out_dim, name=f"{name}_2")(y)
            return jax.nn.sigmoid(y) if sigmoid else y

        out = {
            "mask_logits": head("mask_head", self.num_classes),
            "instance_logits": head("instance_head", self.num_classes),
            "edge_logits": head("edge_head", 1),
            "score": head("score_head", 1, sigmoid=True),
        }
        if return_attention:
            out["attention"] = attn
        return out


def build_multimodal_model(config: Dict[str, Any]) -> MultimodalCamouflageDetector:
    """Factory with the reference's config keys and defaults
    (fusion_model.py:249-259)."""
    return MultimodalCamouflageDetector(
        rg_dim=config.get("rg_dim", 128),
        kg_dim=config.get("kg_dim", 128),
        hidden_dim=config.get("hidden_dim", 256),
        num_heads=config.get("num_heads", 8),
        fusion_type=config.get("fusion_type", "cross_attention"),
        num_classes=config.get("num_classes", 2),
        dropout=config.get("dropout", 0.3),
        use_pallas=config.get("use_pallas", False),
    )
