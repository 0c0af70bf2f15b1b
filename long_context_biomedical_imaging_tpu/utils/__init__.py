from .checkpoint import load_checkpoint, save_checkpoint
from .wandb_utils import WANDB_AVAILABLE, init_wandb

__all__ = ["save_checkpoint", "load_checkpoint", "init_wandb", "WANDB_AVAILABLE"]
