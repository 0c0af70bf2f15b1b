from .train_state import TrainState, create_train_state, make_eval_step, make_train_step
from .trainer import TrainManager

__all__ = ["TrainManager", "TrainState", "create_train_state", "make_train_step",
           "make_eval_step"]
