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
  L0  data/        COD10K dataset scanning + host decode
  L1  ops/ models/ region-graph visual pipeline (SLIC, features, RAG, GNN)
  L2  kg/ models/   knowledge-graph semantic pipeline (in-process store, GNN)
  L3  data/matcher  embedding store + RG↔KG matcher
  L4  models/fusion multimodal fusion + train/
  L5  eval/ utils/  metrics + visualization
"""

__version__ = "0.1.0"

from camouflage_multimodal_tpu.core.config import load_config, default_config  # noqa: F401
