"""TPU-native compute ops.

These replace the third-party compiled libraries the reference leaned on
(SURVEY.md §2.2): skimage SLIC / RAG / Canny (Cython), scipy binary_dilation,
OpenCV label heuristics, torch-geometric sparse GNN kernels and cuDNN
attention — all re-designed as fixed-shape, masked, jittable JAX/Pallas
programs.
"""

from camouflage_multimodal_tpu.ops.image import (  # noqa: F401
    rgb_to_gray,
    rgb_to_lab,
    gaussian_blur,
    imagenet_normalize,
    imagenet_denormalize,
)
from camouflage_multimodal_tpu.ops.morphology import (  # noqa: F401
    binary_dilation_cross,
    binary_dilation_full,
)
from camouflage_multimodal_tpu.ops.canny import canny  # noqa: F401
from camouflage_multimodal_tpu.ops.slic import slic  # noqa: F401
from camouflage_multimodal_tpu.ops.regions import region_features, region_label_means  # noqa: F401
from camouflage_multimodal_tpu.ops.rag import region_adjacency, rag_edge_weights  # noqa: F401
