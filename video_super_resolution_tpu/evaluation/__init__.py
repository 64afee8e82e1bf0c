from video_super_resolution_tpu.evaluation.metrics import (  # noqa: F401
    psnr,
    rgb_to_y,
    ssim,
)
from video_super_resolution_tpu.evaluation.evaluate import evaluate_clip  # noqa: F401
