"""Training runtime: losses, Keras-exact SGD, schedules, state, trainer."""

from . import losses, metrics
from .optimizer import (
    adagrad_update,
    clip_by_per_tensor_norm,
    decay_from_max_decay,
    effective_lr,
    init_velocity,
    keras_sgd,
    sgd_update,
)
from .schedules import (
    LR_SCHEDULES,
    CLRSchedule,
    PiecewiseSchedule,
    PlateauSchedule,
    ResNetSchedule,
    SGDRSchedule,
    get_lr_schedule,
)
from .state import (
    TrainState,
    load_checkpoint,
    load_weights,
    load_weights_by_name,
    new_train_state,
    save_checkpoint,
    save_weights,
)
from .trainer import (
    LOSS_OUTPUT,
    fit,
    make_eval_step,
    make_forward_fn,
    make_train_step,
    run_validation,
)

__all__ = [
    "losses",
    "metrics",
    "sgd_update",
    "init_velocity",
    "adagrad_update",
    "clip_by_per_tensor_norm",
    "effective_lr",
    "decay_from_max_decay",
    "keras_sgd",
    "SGDRSchedule",
    "CLRSchedule",
    "PiecewiseSchedule",
    "PlateauSchedule",
    "ResNetSchedule",
    "get_lr_schedule",
    "LR_SCHEDULES",
    "TrainState",
    "new_train_state",
    "save_checkpoint",
    "load_checkpoint",
    "save_weights",
    "load_weights",
    "load_weights_by_name",
    "make_train_step",
    "make_eval_step",
    "make_forward_fn",
    "run_validation",
    "fit",
    "LOSS_OUTPUT",
]
