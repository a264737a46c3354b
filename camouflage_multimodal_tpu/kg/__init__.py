from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore  # noqa: F401
from camouflage_multimodal_tpu.kg.normalize import extract_structured  # noqa: F401
from camouflage_multimodal_tpu.kg.featurize import (  # noqa: F401
    build_subgraph,
    pad_subgraphs,
    NODE_TYPES,
    COLOR_VOCAB,
    TEXTURE_VOCAB,
)
