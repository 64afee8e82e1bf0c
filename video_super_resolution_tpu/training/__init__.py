from video_super_resolution_tpu.training.state import TrainState, create_train_state  # noqa: F401
from video_super_resolution_tpu.training.step import make_train_step, make_eval_step  # noqa: F401
