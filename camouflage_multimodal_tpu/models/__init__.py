from camouflage_multimodal_tpu.models.layers import MaskedBatchNorm  # noqa: F401
from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN  # noqa: F401
from camouflage_multimodal_tpu.models.knowledge_graph import KnowledgeGraphGNN  # noqa: F401
from camouflage_multimodal_tpu.models.fusion import (  # noqa: F401
    CrossAttentionFusion,
    LateFusion,
    MultimodalCamouflageDetector,
    build_multimodal_model,
)
