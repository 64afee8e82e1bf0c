from video_super_resolution_tpu.parallel.temporal import (  # noqa: F401
    halo_exchange_frames,
    temporal_shard_forward,
)
from video_super_resolution_tpu.parallel.spatial import (  # noqa: F401
    spatial_sharding,
    with_spatial_sharding,
)
