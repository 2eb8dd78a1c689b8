from posterior_matching_tpu.train.callbacks import (
    Callback,
    CheckpointCallback,
    LearningRateLoggerCallback,
    OrbaxCheckpointCallback,
    TensorBoardCallback,
)
from posterior_matching_tpu.train.optim import (
    group_by_shape,
    stacked_shape_mask,
)
from posterior_matching_tpu.train.schedules import (
    cyclical_annealing_schedule,
    get_beta_schedule,
)
from posterior_matching_tpu.train.state import (
    TrainState,
    load_train_state,
    save_train_state,
)
from posterior_matching_tpu.train.trainer import Trainer

__all__ = [
    "Callback",
    "group_by_shape",
    "stacked_shape_mask",
    "CheckpointCallback",
    "LearningRateLoggerCallback",
    "OrbaxCheckpointCallback",
    "TensorBoardCallback",
    "TrainState",
    "Trainer",
    "cyclical_annealing_schedule",
    "get_beta_schedule",
    "load_train_state",
    "save_train_state",
]
