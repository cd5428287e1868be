from baddiffusion_tpu.training.checkpoint import (
    ep_model_path,
    has_trainer_state,
    load_trainer_state,
    save_trainer_state,
)
from baddiffusion_tpu.training.ema import EMAState, ema_decay, ema_init, ema_update
from baddiffusion_tpu.training.optim import cosine_schedule_with_warmup, make_optimizer
from baddiffusion_tpu.training.score_matching import (
    ScoreTrainState,
    create_score_train_state,
    make_ve_train_step,
)
from baddiffusion_tpu.training.train import TrainState, create_train_state, make_train_step
from baddiffusion_tpu.training.trainer import sample_grids, train_loop

__all__ = [
    "ep_model_path",
    "has_trainer_state",
    "load_trainer_state",
    "save_trainer_state",
    "EMAState",
    "ema_decay",
    "ema_init",
    "ema_update",
    "cosine_schedule_with_warmup",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "sample_grids",
    "train_loop",
]
