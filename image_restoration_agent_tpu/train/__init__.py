from .schedules import (
    multi_step_restart_lr, cosine_annealing_restart_lr,
    cosine_annealing_restart_cyclic_lr,
)
from .losses import charbonnier_loss, l1_loss, psnr_loss
from .trainer import Trainer, TrainConfig

__all__ = [
    "multi_step_restart_lr", "cosine_annealing_restart_lr",
    "cosine_annealing_restart_cyclic_lr",
    "charbonnier_loss", "l1_loss", "psnr_loss",
    "Trainer", "TrainConfig",
]
