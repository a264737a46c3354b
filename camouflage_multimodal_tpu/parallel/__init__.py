from camouflage_multimodal_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    shard_fusion_params,
)
