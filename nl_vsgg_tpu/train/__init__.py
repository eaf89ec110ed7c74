from .state import PlateauScheduler, TrainState, create_train_state, make_optimizer
from .step import make_eval_step, make_train_step, stack_entries

__all__ = ["PlateauScheduler", "TrainState", "create_train_state", "make_optimizer",
           "make_eval_step", "make_train_step", "stack_entries"]
