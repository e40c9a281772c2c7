from .loss import compression_rate_list, rate_loss_list
from .schedule import ReduceLROnPlateau
from .steps import (TrainState, get_learning_rate, init_state, make_eval_step,
                    make_optimizer, make_train_step, set_learning_rate)
from .trainer import Trainer, pad_to_multiple
