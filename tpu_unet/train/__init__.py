from tpu_unet.train.optimizer import PlateauState, plateau_init, plateau_step, make_optimizer
from tpu_unet.train.trainer import Trainer, TrainState
