"""Training layer (L5): trainer loop, optimizers, schedulers, checkpoints."""
from .checkpoint import load_checkpoint, restore_into, save_checkpoint
from .trainer import (
    ExpScheduler,
    PlateauScheduler,
    Trainer,
    build_optimizer,
    build_scheduler,
)
from .sampling_eval import BestCheckpointTracker, evaluate_samples

__all__ = [k for k in dir() if not k.startswith('_')]
