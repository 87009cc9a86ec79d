from audio_transformers_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
