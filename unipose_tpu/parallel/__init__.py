from unipose_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from unipose_tpu.parallel.cp import (  # noqa: F401
    clip_sharding,
    make_video_mesh,
    shard_clip_batch,
    under_mesh,
)
