"""camouflage_multimodal_tpu — a TPU-native (JAX/XLA/Pallas) framework for
camouflaged-object detection with region-graph + knowledge-graph multimodal
fusion.

This is a from-scratch, TPU-first re-design of the capabilities of the
reference repo ``rajan-dubey8/camouflage-multimodal`` (PyTorch +
torch-geometric + skimage, CPU/GPU).  The compute path is pure JAX/XLA with
Pallas kernels for the hot ops; irregular CPU loops from the reference
(superpixel feature extraction, per-sample training loops) are re-formulated
as fixed-shape, masked, batched tensor programs that XLA can tile onto the
MXU and that scale over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1 of the reference):
  L0  data/        COD10K dataset scanning + host decode (PIL or native C++)
  L1  ops/ models/ region-graph visual pipeline (SLIC, features, RAG, GNN)
  L2  kg/ models/   knowledge-graph semantic pipeline (in-process store, GNN)
  L3  data/matcher  embedding store + RG↔KG matcher
  L4  models/fusion multimodal fusion + train/
  L5  eval/ utils/  metrics + visualization
"""

__version__ = "0.1.0"

from camouflage_multimodal_tpu.core.config import load_config, default_config  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules at package
    import)."""
    _lazy = {
        "RegionGraphGNN": ("camouflage_multimodal_tpu.models", "RegionGraphGNN"),
        "KnowledgeGraphGNN": ("camouflage_multimodal_tpu.models", "KnowledgeGraphGNN"),
        "MultimodalCamouflageDetector": ("camouflage_multimodal_tpu.models", "MultimodalCamouflageDetector"),
        "build_multimodal_model": ("camouflage_multimodal_tpu.models", "build_multimodal_model"),
        "RegionGraphPipeline": ("camouflage_multimodal_tpu.pipeline", "RegionGraphPipeline"),
        "MultimodalPipeline": ("camouflage_multimodal_tpu.pipeline", "MultimodalPipeline"),
        "detect_camouflage": ("camouflage_multimodal_tpu.api", "detect_camouflage"),
        "MultimodalPredictor": ("camouflage_multimodal_tpu.api", "MultimodalPredictor"),
        "evaluate_directory": ("camouflage_multimodal_tpu.api", "evaluate_directory"),
        "EmbeddingMatcher": ("camouflage_multimodal_tpu.data.matcher", "EmbeddingMatcher"),
        "CamouflageKnowledgeStore": ("camouflage_multimodal_tpu.kg.store", "CamouflageKnowledgeStore"),
    }
    if name in _lazy:
        import importlib

        module, attr = _lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
