"""TPU-native video super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``PlanNoa/video_super_resolution`` (see SURVEY.md §1.1 for the capability
contract — the reference mount was empty, so parity is defined against the
spec + torch-CPU oracles):

- dense optical flow via cost-volume correlation (PWC-style pyramid),
- flow-guided backward warping of neighbor frames onto the reference frame,
- depth-guided feature fusion,
- SR reconstruction with sub-pixel (pixel-shuffle) x4 upsampling,
- Charbonnier-loss training as a single pjit-compiled program,
- timeline (temporal context-parallel) sharding with halo exchange and
  spatial tiling for multi-host streaming inference.

Layout convention: NHWC / channels-last everywhere (TPU-friendly: the
channel dim rides the 128-lane registers). Frames are float32/bfloat16 in
[0, 1]. Flow fields are (dx, dy) in *pixel* units, channels-last, i.e.
``flow[..., 0]`` displaces along W and ``flow[..., 1]`` along H.
"""

__version__ = "0.1.0"

from video_super_resolution_tpu.config import (  # noqa: F401
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    VSRConfig,
)
