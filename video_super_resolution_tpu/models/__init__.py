from video_super_resolution_tpu.models.feature_pyramid import FeaturePyramid  # noqa: F401
from video_super_resolution_tpu.models.flow_net import FlowNet  # noqa: F401
from video_super_resolution_tpu.models.depth_net import DepthNet  # noqa: F401
from video_super_resolution_tpu.models.fusion import DepthGuidedFusion  # noqa: F401
from video_super_resolution_tpu.models.sr_head import SRHead  # noqa: F401
from video_super_resolution_tpu.models.vsr import VSRModel  # noqa: F401
