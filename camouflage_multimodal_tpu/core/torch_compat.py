"""Torch-checkpoint → flax-variables transplanter.

Loads the reference's trained torch checkpoints into this repo's flax
models so reference users can migrate weights, and so the end-to-end
fidelity gate can compare the composed pipelines under identical weights.

Reference checkpoint formats handled (see their save/load sites):

* Region-graph: a bare ``state_dict`` of ``RegionGraphGNN``
  (``/root/reference/models/region_graph/train.py:383,463``; loaded at
  ``test.py:198`` / ``extract_rg_embeddings.py:537``) — PyG
  ``GATConv``/``GCNConv`` + ``BatchNorm1d`` + ``Linear`` tensors.
* Knowledge-graph: ``{'model_state_dict', 'embedding_dim', ...}``
  (``train_model.py:422-427``).
* Multimodal: ``{'model_state_dict', 'config', 'epoch', ...}`` in two
  generations — the old one carries ``val_acc``/``balanced_acc``, the new
  one ``val_f1_class_1``/``val_acc_0`` (``test_multimodal.py:44-53``
  handles both; so does :func:`load_torch_checkpoint`).

Layout conversions (torch → flax):
  ``Linear.weight`` (out,in) → ``Dense.kernel`` (in,out) — transposed.
  ``MultiheadAttention.in_proj_weight`` (3E,E) → wq/wk/wv (E,E) each
  transposed; ``out_proj`` → wo/bo.
  ``GATConv.lin.weight`` (heads·H, in) → ``gat_kernel`` (in, heads, H);
  ``att_src``/``att_dst`` (1,heads,H) → (heads,H).
  ``GCNConv.lin.weight`` (H,H) → ``gcn*_kernel`` (H,H) transposed.
  ``BatchNorm1d`` weight/bias → MaskedBatchNorm scale/bias params;
  running_mean/var → batch_stats mean/var.

Everything operates on plain numpy arrays; torch is only required inside
:func:`load_torch_checkpoint` to deserialize ``.pth`` files.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor or array-like → float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _dense(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _batchnorm(sd: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _first_key(sd: Dict[str, Any], *candidates: str) -> str:
    for key in candidates:
        if key in sd:
            return key
    raise KeyError(f"none of {candidates} in checkpoint "
                   f"(keys: {sorted(sd)[:8]}...)")


def _mha(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.MultiheadAttention → ops.attention parameter dict."""
    ipw = _np(sd[f"{prefix}.in_proj_weight"])
    ipb = _np(sd[f"{prefix}.in_proj_bias"])
    E = ipw.shape[1]
    return {
        "wq": ipw[:E].T, "wk": ipw[E:2 * E].T, "wv": ipw[2 * E:].T,
        "bq": ipb[:E], "bk": ipb[E:2 * E], "bv": ipb[2 * E:],
        "wo": _np(sd[f"{prefix}.out_proj.weight"]).T,
        "bo": _np(sd[f"{prefix}.out_proj.bias"]),
    }


# ---------------------------------------------------------------------------
# Region-graph GNN (models/region_graph.RegionGraphGNN)
# ---------------------------------------------------------------------------

def import_rg_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """PyG RegionGraphGNN state_dict → ``{'params', 'batch_stats'}``."""
    sd = dict(sd)
    heads_lin = _np(sd[_first_key(sd, "conv1.lin.weight", "conv1.lin_src.weight")])
    att_src = _np(sd[_first_key(sd, "conv1.att_src", "conv1.att_l")])
    heads, H = att_src.shape[-2], att_src.shape[-1]
    params: Dict[str, Any] = {
        # (heads·H, in) → (in, heads·H) → (in, heads, H): PyG views the
        # projected features row-major as (N, heads, H).
        "gat_kernel": heads_lin.T.reshape(-1, heads, H),
        "gat_att_src": att_src.reshape(heads, H),
        "gat_att_dst": _np(sd[_first_key(sd, "conv1.att_dst", "conv1.att_r")]).reshape(heads, H),
        "gat_bias": _np(sd["conv1.bias"]),
    }
    batch_stats: Dict[str, Any] = {}
    for i in (1, 2, 3, 4):
        if i > 1:
            lin = _first_key(sd, f"conv{i}.lin.weight", f"conv{i}.weight")
            params[f"gcn{i}_kernel"] = _np(sd[lin]).T
            params[f"gcn{i}_bias"] = _np(sd[f"conv{i}.bias"])
        params[f"bn{i}"], batch_stats[f"bn{i}"] = _batchnorm(sd, f"bn{i}")
    for torch_name, flax_name in (
        ("fc_shared", "fc_shared"),
        ("fc_mask_1", "fc_mask_1"), ("fc_mask_2", "fc_mask_2"),
        ("fc_instance_1", "fc_instance_1"), ("fc_instance_2", "fc_instance_2"),
        ("fc_edge_1", "fc_edge_1"), ("fc_edge_2", "fc_edge_2"),
    ):
        params[flax_name] = _dense(sd, torch_name)
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Knowledge-graph GNN (models/knowledge_graph.KnowledgeGraphGNN)
# ---------------------------------------------------------------------------

def import_kg_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """PyG KnowledgeGraphGNN state_dict → ``{'params', 'batch_stats'}``."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        lin = _first_key(sd, f"conv{i}.lin.weight", f"conv{i}.weight")
        params[f"gcn{i}_kernel"] = _np(sd[lin]).T
        params[f"gcn{i}_bias"] = _np(sd[f"conv{i}.bias"])
        params[f"bn{i}"], batch_stats[f"bn{i}"] = _batchnorm(sd, f"bn{i}")
    params["embedding"] = _dense(sd, "embedding_layer.0")
    params["classifier_1"] = _dense(sd, "classifier.0")
    params["classifier_2"] = _dense(sd, "classifier.3")
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Multimodal fusion (models/fusion.MultimodalCamouflageDetector)
# ---------------------------------------------------------------------------

def import_fusion_state_dict(sd: Dict[str, Any],
                             config: Optional[Dict[str, Any]] = None
                             ) -> Dict[str, Any]:
    """MultimodalCamouflageDetector state_dict → ``{'params'}``.

    Handles both fusion types; cross-attention projections (``rg_proj`` /
    ``kg_proj``) are nn.Identity when dims already match, in which case the
    keys are simply absent on both sides.
    """
    config = config or {}
    fusion: Dict[str, Any] = {}
    if "fusion.fusion.0.weight" in sd:  # late fusion MLP (fusion_model.py:149-171)
        for seq_idx, name in ((0, "fc1"), (3, "fc2"), (6, "fc3")):
            fusion[name] = _dense(sd, f"fusion.fusion.{seq_idx}")
    else:  # cross-attention (fusion_model.py:16-146)
        for proj in ("rg_proj", "kg_proj"):
            if f"fusion.{proj}.weight" in sd:
                fusion[proj] = _dense(sd, f"fusion.{proj}")
        for attn in ("cross_attn_rg2kg", "cross_attn_kg2rg"):
            fusion[attn] = _mha(sd, f"fusion.{attn}")
        for ln in ("ln_rg", "ln_kg"):
            fusion[ln] = {"scale": _np(sd[f"fusion.{ln}.weight"]),
                          "bias": _np(sd[f"fusion.{ln}.bias"])}
        for ffn in ("ffn_rg", "ffn_kg"):
            fusion[ffn] = {"fc1": _dense(sd, f"fusion.{ffn}.0"),
                           "fc2": _dense(sd, f"fusion.{ffn}.3")}
        fusion["fusion_1"] = _dense(sd, "fusion.fusion_layer.0")
        fusion["fusion_2"] = _dense(sd, "fusion.fusion_layer.3")

    params: Dict[str, Any] = {"fusion": fusion}
    for head in ("mask_head", "instance_head", "edge_head", "score_head"):
        params[f"{head}_1"] = _dense(sd, f"{head}.0")
        params[f"{head}_2"] = _dense(sd, f"{head}.3")
    return {"params": params}


# ---------------------------------------------------------------------------
# Checkpoint-file entry point
# ---------------------------------------------------------------------------

_RG_MARKERS = ("conv1.att_src", "conv1.att_l")


def detect_state_dict_kind(sd: Dict[str, Any]) -> str:
    if any(k in sd for k in _RG_MARKERS):
        return "region_graph"
    if "embedding_layer.0.weight" in sd:
        return "knowledge_graph"
    if any(k.startswith("mask_head.") for k in sd):
        return "fusion"
    raise ValueError(f"unrecognized torch state_dict (keys: {sorted(sd)[:8]}...)")


def load_torch_checkpoint(path: str, kind: Optional[str] = None
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference ``.pth``/``.pt`` checkpoint into flax variables.

    Returns ``(variables, meta)`` where ``variables`` feeds
    ``model.apply(variables, ...)`` directly (params [+ batch_stats]) and
    ``meta`` carries whatever bookkeeping the checkpoint held (epoch,
    config, val metrics of either generation — test_multimodal.py:44-53).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    meta: Dict[str, Any] = {}
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        meta = {k: v for k, v in blob.items()
                if k not in ("model_state_dict", "optimizer_state_dict")}
    else:
        sd = blob  # bare state_dict (region-graph generation)
    sd = {k: v for k, v in sd.items()}

    kind = kind or detect_state_dict_kind(sd)
    importer = {
        "region_graph": import_rg_state_dict,
        "knowledge_graph": import_kg_state_dict,
        "fusion": lambda d: import_fusion_state_dict(
            d, (meta.get("config") or {}).get("model")),
    }[kind]
    variables = importer(sd)
    meta["kind"] = kind
    import jax
    import jax.numpy as jnp

    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return variables, meta
