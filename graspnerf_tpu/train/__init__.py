from . import losses
from .schedule import exp_decay_lr, warmup_exp_decay_lr
from .checkpoint import CheckpointManager
from .trainer import (Trainer, TrainState, create_train_state, make_train_step,
                      make_eval_step, make_loss_fn, make_batched_loss_fn,
                      compute_losses)
from . import metrics
from .profiling import ThroughputMeter, trace, timed, rays_per_step
