from video_super_resolution_tpu.runtime.mesh import (  # noqa: F401
    AXIS_DATA,
    AXIS_SPACE,
    AXIS_TIME,
    build_mesh,
    local_mesh,
)
from video_super_resolution_tpu.runtime.dtypes import DTypePolicy  # noqa: F401
