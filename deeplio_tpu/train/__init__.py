from deeplio_tpu.train.checkpoint import (
    CheckpointManager,
    load_params,
    load_pointseg_backbone,
    save_params,
)
from deeplio_tpu.train.loop import Trainer
from deeplio_tpu.train.optim import make_optimizer, make_schedule
from deeplio_tpu.train.state import TrainState, create_train_state
from deeplio_tpu.train.step import build_train_step, make_model_batch
