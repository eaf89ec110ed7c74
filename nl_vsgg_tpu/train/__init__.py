from .state import (PlateauScheduler, TrainState, create_train_state,
                    make_optimizer, set_learning_rate)
from .step import make_eval_step, make_train_step, place_entries, stack_entries

__all__ = ["PlateauScheduler", "TrainState", "create_train_state",
           "make_optimizer", "set_learning_rate", "make_eval_step",
           "make_train_step", "place_entries", "stack_entries"]
