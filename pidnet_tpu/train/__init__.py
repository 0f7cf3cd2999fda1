from pidnet_tpu.train.step import TrainState, make_train_step, make_eval_step  # noqa: F401
from pidnet_tpu.train.lr import poly_lr  # noqa: F401
