"""End-to-end jitted pipelines.

This is the TPU re-formulation of the reference's three inference call
stacks (SURVEY.md §3): everything from the decoded uint8/float image to the
per-pixel camouflage heatmap runs as ONE jitted XLA program per batch —
SLIC, Canny, segment features, RAG, the region-graph GNN, the multimodal
fusion and the mask paint-back (``region_graph/test.py:241-244``) — with a
real batch axis instead of the reference's per-image Python loops.

Shapes are static per (image_size, n_segments) pair: the SLIC grid gives
``gh·gw`` clusters, padded into a ``max_nodes`` bucket.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector
from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
from camouflage_multimodal_tpu.ops.canny import canny
from camouflage_multimodal_tpu.ops.connectivity import (
    enforce_label_connectivity_batched)
from camouflage_multimodal_tpu.ops.image import rgb_to_gray
from camouflage_multimodal_tpu.ops.rag import rag_edge_weights, region_adjacency
from camouflage_multimodal_tpu.ops.regions import region_features, region_label_means
from camouflage_multimodal_tpu.ops.slic import grid_shape, slic


class RegionGraphBatch(NamedTuple):
    """Fixed-shape padded region-graph batch."""

    segments: jnp.ndarray      # (B, H, W) int32
    features: jnp.ndarray      # (B, K, 15) f32
    adjacency: jnp.ndarray     # (B, K, K) bool
    edge_weights: jnp.ndarray  # (B, K, K) f32
    node_mask: jnp.ndarray     # (B, K) bool
    # SLIC window-drift telemetry (B,) f32: max center drift as a fraction
    # of the provable safe bound for the window radius used. < 1 ⇒ the
    # windowed assign provably equals skimage's all-K sweep for that image
    # (ops/slic.py:window_drift_bound). Rides along for free (K-sized
    # per-iteration max inside the already-jitted SLIC loop), so production
    # callers can REPORT violations instead of needing a debug rerun
    # (VERDICT r4 item 4c).
    window_drift: jnp.ndarray = None


def padded_nodes(n_segments: int, image_size: int, multiple: int = 128) -> int:
    """Node bucket: SLIC grid size rounded up to a lane-aligned multiple.

    Worst-case note (static-bucket audit, VERDICT r3 item 7): the provable
    post-connectivity survivor bound is 2·n_segments (every survivor holds
    ≥ min_size = 0.5·H·W/n_segments pixels), which EXCEEDS this gh·gw-based
    bucket (e.g. 640 vs 1,000 at 256²/500) — so overflow is theoretically
    reachable. The policy is explicit, not silent: ``build_region_graphs``
    passes ``max_labels=max_nodes`` into the connectivity pass, which
    clamp-merges raster-late survivors into the last in-bucket label
    (ops/connectivity.py docstring). Empirically the COD10K-wide worst is
    530 survivors of a 500-segment request (tests/test_slic_crossval.py
    pins the distribution), 17% of the way to the 640 bucket. Callers that
    need the provable bound can pass max_nodes=2·n_segments rounded up.
    """
    gh, gw = grid_shape(n_segments, image_size, image_size)
    k = gh * gw
    return ((k + multiple - 1) // multiple) * multiple


@functools.partial(jax.jit, static_argnames=("n_segments", "max_nodes",
                                             "slic_iters", "window_radius",
                                             "feature_norm"))
def build_region_graphs(images: jnp.ndarray, n_segments: int = 500,
                        max_nodes: Optional[int] = None,
                        slic_iters: int = 10,
                        window_radius: int = 3,
                        feature_norm: Optional[int] = None) -> RegionGraphBatch:
    """images: (B, H, W, 3) float RGB in [0,1] → padded graph batch.

    Replaces ``create_region_graph`` (train.py:89-221) wholesale: one fused
    program, batched over B.

    ``feature_norm``: None (default) normalizes positional features by the
    actual image size; 256 reproduces the reference's hard-coded /256
    (``region_features`` docstring) — required when running
    reference-recipe weights at non-256 resolutions.
    """

    # uint8 input is accepted and normalized on device — ship 1 byte/channel
    # over the host link instead of 4 (the transfer, not the compute, is the
    # bottleneck on tunneled hosts).
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if max_nodes is None:
        max_nodes = padded_nodes(n_segments, images.shape[1])

    # SLIC raw assignment per image, then the BATCHED connectivity pass:
    # the run-structured fast path needs its run-bucket predicate hoisted
    # outside vmap (a cond under vmap would execute both branches — see
    # enforce_label_connectivity_batched). max_labels=max_nodes:
    # fragment-heavy images can exceed the gh·gw bucket; the connectivity
    # pass clamps overflow explicitly instead of letting segment_sum drop
    # those regions silently.
    # window_radius=3 (7×7 candidate window) is the PRODUCTION default:
    # its provable safe-drift bound is 2.5·step — 1.4× the worst drift
    # ever measured on COD10K (1.78·step, tests/test_slic_window.py) —
    # where the 5×5 default's 1.5·step bound IS exceeded on ~10% of real
    # images. Measured cost at 352²/batch-16 on the live TPU: ~+1.3 ms/img
    # device, ~0 e2e (the pipeline is host-decode-bound). The drift ratio
    # rides along as telemetry so even a >2.5·step excursion is reported,
    # never silent (VERDICT r4 item 4).
    raw, drift = jax.vmap(lambda img: slic(img, n_segments=n_segments,
                                           num_iters=slic_iters,
                                           enforce_connectivity=False,
                                           window_radius=window_radius,
                                           return_drift=True))(images)
    seg = enforce_label_connectivity_batched(raw, n_segments,
                                             max_labels=max_nodes)

    def one(img, seg):
        edges = canny(rgb_to_gray(img), sigma=2.0)
        reg = region_features(img, seg, edges, max_nodes,
                              norm_size=feature_norm)
        adj = region_adjacency(seg, max_nodes)
        w = rag_edge_weights(reg["features"], adj)
        return reg["features"], adj, w, reg["node_mask"]

    feats, adj, w, mask = jax.vmap(one)(images, seg)
    return RegionGraphBatch(seg, feats, adj, w, mask, drift)


@functools.partial(jax.jit, static_argnames=("n_segments", "max_nodes",
                                             "slic_iters", "window_radius"))
def build_region_graphs_with_labels(
    images: jnp.ndarray, masks: jnp.ndarray, instances: jnp.ndarray,
    edges_gt: jnp.ndarray, n_segments: int = 500, max_nodes: Optional[int] = None,
    slic_iters: int = 10, window_radius: int = 3,
) -> Tuple[RegionGraphBatch, Dict[str, jnp.ndarray]]:
    """Training variant: also derives per-node GT labels with the reference's
    thresholds (mask>0.5, instance>0.5, edge>0.3 — train.py:168-176)."""
    if max_nodes is None:
        max_nodes = padded_nodes(n_segments, images.shape[1])
    batch = build_region_graphs(images, n_segments, max_nodes, slic_iters,
                                window_radius)

    def to01(x):
        return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x

    masks, instances, edges_gt = to01(masks), to01(instances), to01(edges_gt)

    def labels_one(seg, m, inst, e):
        stacked = jnp.stack([m, inst, e], axis=-1)
        means = region_label_means(stacked, seg, max_nodes)
        return means

    means = jax.vmap(labels_one)(batch.segments, masks, instances, edges_gt)
    labels = {
        "mask_labels": (means[..., 0] > 0.5).astype(jnp.int32),
        "instance_labels": (means[..., 1] > 0.5).astype(jnp.int32),
        "edge_labels": (means[..., 2] > 0.3).astype(jnp.float32),
    }
    return batch, labels


def paint_segments(segment_values: jnp.ndarray, segments: jnp.ndarray,
                   mapping: str = "corrected") -> jnp.ndarray:
    """Per-segment values (B, K) → per-pixel map (B, H, W): the mask
    reconstruction of region_graph/test.py:241-244 as a batched gather.

    ``mapping="corrected"`` (default) paints each pixel with its own
    region's value. ``mapping="verbatim"`` reproduces the reference's
    off-by-one bug-compatibly: the reference builds ``region_id_map``
    and applies it to edges (test.py:148,159-161) but indexes
    ``mask_probs[region_id]`` with the RAW 1-based skimage label
    (test.py:241-244), so every pixel shows the NEXT region's probability
    and the raster-last region stays 0. With 0-based labels that is a
    one-column shift of the padded value vector (padding is already 0).
    """
    if mapping == "verbatim":
        segment_values = jnp.concatenate(
            [segment_values[..., 1:], jnp.zeros_like(segment_values[..., :1])],
            axis=-1)
    elif mapping != "corrected":
        raise ValueError(f"mapping must be 'corrected' or 'verbatim', got {mapping!r}")
    return jax.vmap(lambda v, s: v[s])(segment_values, segments)


class RegionGraphPipeline:
    """Image → region-graph GNN predictions, one jit.

    Mirrors the API surface of the reference's ``detect_camouflage``
    (test.py:185-362) and ``extract_embeddings_from_image``
    (extract_rg_embeddings.py:249-288).
    """

    def __init__(self, model: RegionGraphGNN, n_segments: int = 500,
                 image_size: int = 256, max_nodes: Optional[int] = None,
                 slic_iters: int = 10, paint_mapping: str = "corrected",
                 mesh=None, spatial: bool = False,
                 window_radius: int = 3,
                 feature_norm: Optional[int] = None) -> None:
        self.model = model
        self.n_segments = n_segments
        self.image_size = image_size
        self.max_nodes = max_nodes or padded_nodes(n_segments, image_size)
        self.slic_iters = slic_iters
        self.window_radius = window_radius
        # None = normalize positional features by the actual image size;
        # 256 = the reference's hard-coded normalizer (needed to run
        # reference-recipe weights at non-256 sizes — see region_features).
        self.feature_norm = feature_norm
        # "corrected" | "verbatim" — see paint_segments; "verbatim" gives
        # bug-compatible reference heatmaps (test.py:241-244 off-by-one).
        self.paint_mapping = paint_mapping
        # Data-parallel mesh: batches shard over the ``data`` axis, the
        # per-image pipeline runs embarrassingly parallel across chips.
        # spatial=True additionally shards image ROWS over the ``model``
        # axis (sp — batch-1 / high-res latency scaling; see
        # parallel.sharding.shard_spatial).
        self.mesh = mesh
        self.spatial = spatial
        self._forward = jax.jit(self._forward_impl)

    def _shard_images(self, images):
        if self.mesh is None:
            return images
        if self.spatial and self.mesh.shape.get("model", 1) > 1:
            from camouflage_multimodal_tpu.parallel.sharding import shard_spatial

            return shard_spatial(images, self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("data", *([None] * (images.ndim - 1)))
        return jax.device_put(images, NamedSharding(self.mesh, spec))

    def _forward_impl(self, variables, images):
        batch = build_region_graphs(images, self.n_segments, self.max_nodes,
                                    self.slic_iters, self.window_radius,
                                    self.feature_norm)
        out = self.model.apply(variables, batch.features, batch.adjacency,
                               batch.edge_weights, batch.node_mask)
        probs = jax.nn.softmax(out["mask_logits"], axis=-1)[..., 1]
        probs = jnp.where(batch.node_mask, probs, 0.0)
        heatmap = paint_segments(probs, batch.segments, self.paint_mapping)
        return {
            "heatmap": heatmap,                       # (B, H, W) in [0,1]
            "segments": batch.segments,
            "node_mask": batch.node_mask,
            "region_features": batch.features,        # (B, K, 15) raw features
            "mask_logits": out["mask_logits"],
            "instance_logits": out["instance_logits"],
            "edge_logits": out["edge_logits"],
            "node_embeddings": out["node_embeddings"],
            "graph_embedding": out["graph_embedding"],
            # (B,) drift ratio; ≥ 1 means the SLIC window was not provably
            # exact for that image (see RegionGraphBatch.window_drift)
            "window_drift": batch.window_drift,
        }

    def __call__(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self._forward(variables, self._shard_images(images))


class MultimodalPipeline:
    """Image + KG category embeddings → 4-head multimodal predictions.

    The fused equivalent of ``predict_single_image``
    (test_multimodal.py:83-152): RG extraction re-runs per image, then the
    padded node embeddings cross-attend to the KG tensor — all one jit,
    batched.
    """

    def __init__(self, rg_pipeline: RegionGraphPipeline,
                 fusion_model: MultimodalCamouflageDetector) -> None:
        self.rg = rg_pipeline
        self.fusion_model = fusion_model
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, rg_variables, fusion_variables, images, kg_tensor):
        rg_out = self.rg._forward_impl(rg_variables, images)
        B = images.shape[0]
        kg = jnp.broadcast_to(kg_tensor[None], (B,) + kg_tensor.shape)
        out = self.fusion_model.apply(
            fusion_variables, rg_out["node_embeddings"], kg,
            rg_mask=rg_out["node_mask"], return_attention=True,
        )
        if out.get("attention") is None:
            out.pop("attention", None)  # late fusion exposes no attention maps
        out["mask_prob"] = jax.nn.softmax(out["mask_logits"], axis=-1)
        out["instance_prob"] = jax.nn.softmax(out["instance_logits"], axis=-1)
        out["edge_prob"] = jax.nn.sigmoid(out["edge_logits"])
        out["segments"] = rg_out["segments"]
        out["heatmap"] = rg_out["heatmap"]
        out["node_mask"] = rg_out["node_mask"]
        return out

    def __call__(self, rg_variables, fusion_variables, images, kg_tensor):
        return self._forward(rg_variables, fusion_variables,
                             self.rg._shard_images(images), kg_tensor)
