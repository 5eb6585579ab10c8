from multimodal_content_moderation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    build_mesh,
    init_distributed,
    replicate,
    replicated_sharding,
    shard_batch,
)
