from video_super_resolution_tpu.utils.logging import MetricsLogger  # noqa: F401
from video_super_resolution_tpu.utils.profiling import (  # noqa: F401
    profile_trace,
    roofline_report,
)
