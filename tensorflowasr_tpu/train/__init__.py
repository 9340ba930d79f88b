from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
from tensorflowasr_tpu.train.asr_trainer import (
    CTCTrainer,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "ASRTrainState",
    "make_optimizer",
    "CTCTrainer",
    "make_train_step",
    "make_eval_step",
]
