from camouflage_multimodal_tpu.data.cod10k import (  # noqa: F401
    CODDataset,
    load_image_rgb,
    load_mask,
    parse_cod10k_name,
)
from camouflage_multimodal_tpu.data.matcher import EmbeddingMatcher  # noqa: F401
from camouflage_multimodal_tpu.data.labels import extract_label_from_mask  # noqa: F401
