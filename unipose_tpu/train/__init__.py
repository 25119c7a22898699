from unipose_tpu.train.optim import make_optimizer, step_decay_schedule  # noqa: F401
from unipose_tpu.train.state import TrainState, create_train_state  # noqa: F401
from unipose_tpu.train.steps import (  # noqa: F401
    make_eval_step,
    make_train_step,
    preprocess_images,
)
