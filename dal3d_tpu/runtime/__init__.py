from .steps import TrainState, create_train_state, make_predict_step, make_train_step
from .trainer import Trainer, LogBuffer
from .checkpoint import save_checkpoint, load_checkpoint, latest_epoch
