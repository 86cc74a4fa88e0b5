"""Training layer: optax optimizers with the reference's schedules,
composite losses, jitted SPMD train steps, checkpoint/resume, recorder."""

from .losses import compute_losses, smooth_l1, masked_mean
from .optim import make_optimizer, exponential_lr, make_multi_step_lr
from .trainer import Trainer, TrainState
from .checkpoints import (save_checkpoint, load_checkpoint,
                          latest_epoch, save_best_checkpoint, best_metric)
from .recorder import Recorder
