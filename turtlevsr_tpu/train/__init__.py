from turtlevsr_tpu.train.lr_schedule import build_schedule  # noqa: F401
from turtlevsr_tpu.train.step import TrainState, make_optimizer, make_train_step  # noqa: F401
