from semi_tpu.train.checkpoint import load_pytree, save_pytree
from semi_tpu.train.optim import (
    make_optimizer, noam_lr, plateau_init, plateau_step)
from semi_tpu.train.step import (
    TrainState, init_train_state, make_eval_step, make_train_step)

__all__ = [
    "load_pytree", "save_pytree",
    "make_optimizer", "noam_lr", "plateau_init", "plateau_step",
    "TrainState", "init_train_state", "make_eval_step", "make_train_step",
]
