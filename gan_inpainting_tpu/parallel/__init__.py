from gan_inpainting_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    build_mesh,
    local_mesh,
)
from gan_inpainting_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated,
    shard_batch,
    shard_channels,
    ShardingRules,
)
