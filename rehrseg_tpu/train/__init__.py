from .state import TrainState
from .optim import (
    onecycle_adam,
    nesterov_sgd,
    nesterov_sgd_grouped,
    sr_head_label_fn,
    poly_epoch_schedule,
)
from .sr_trainer import make_sr_train_step, crop_hr_target
from .seg_trainer import (
    make_seg_train_step,
    flavr_teacher_features,
    flavr_window_indices,
    SegBatch,
)
