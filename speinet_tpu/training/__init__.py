from speinet_tpu.training.loss import LossComputer, parse_loss_spec
from speinet_tpu.training.train_state import TrainState, create_train_state
