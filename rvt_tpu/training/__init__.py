from rvt_tpu.training.losses import yolox_loss
from rvt_tpu.training.optimizer import make_optimizer, onecycle_schedule
from rvt_tpu.training.step import (TrainState, init_train_state,
                                   make_eval_step, make_train_step)
