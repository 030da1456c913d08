from pggan_tpu.train.schedule import ProgressiveSchedule  # noqa: F401
from pggan_tpu.train.step import TrainState, make_train_step, make_optimizers  # noqa: F401
