from theia_tpu.train.optim import (
    cosine_restarts_with_warmup,
    constant_with_warmup,
    make_optimizer,
    no_weight_decay_mask,
    scaled_lr,
)
from theia_tpu.train.state import TrainState
from theia_tpu.train.step import make_eval_step, make_train_step

__all__ = [
    "cosine_restarts_with_warmup",
    "constant_with_warmup",
    "make_optimizer",
    "no_weight_decay_mask",
    "scaled_lr",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
