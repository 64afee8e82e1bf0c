from video_super_resolution_tpu.data.synthetic import (  # noqa: F401
    moving_gradient_clip,
    synthetic_clip_pair,
)
from video_super_resolution_tpu.data.dataset import (  # noqa: F401
    ClipDataset,
    sliding_window_indices,
)
