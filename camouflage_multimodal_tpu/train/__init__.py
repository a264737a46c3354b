from camouflage_multimodal_tpu.train.losses import (  # noqa: F401
    weighted_cross_entropy,
    bce_with_logits,
    focal_loss,
)
from camouflage_multimodal_tpu.train.schedules import cosine_warm_restarts  # noqa: F401
