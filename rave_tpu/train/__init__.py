from .loop import TrainState, init_state, make_eval_step, make_train_step
from . import schedules
