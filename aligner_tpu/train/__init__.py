from .checkpoint import restore_checkpoint, save_checkpoint
from .step import (TrainState, bin_loss_weight, create_train_state,
                   make_train_step)

__all__ = ["TrainState", "bin_loss_weight", "create_train_state",
           "make_train_step", "restore_checkpoint", "save_checkpoint"]
