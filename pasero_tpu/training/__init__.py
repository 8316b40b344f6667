"""Training loop: jitted SPMD train/valid steps, checkpointing."""

from .trainer import TrainState, Trainer, shift_targets
