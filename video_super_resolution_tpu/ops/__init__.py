from video_super_resolution_tpu.ops.correlation import correlation  # noqa: F401
from video_super_resolution_tpu.ops.warp import backward_warp  # noqa: F401
from video_super_resolution_tpu.ops.pixel_shuffle import (  # noqa: F401
    pixel_shuffle,
    pixel_unshuffle,
)
from video_super_resolution_tpu.ops.losses import charbonnier_loss  # noqa: F401
from video_super_resolution_tpu.ops.resize import resize_bilinear, resize_bicubic  # noqa: F401
