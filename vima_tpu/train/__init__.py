from vima_tpu.train.loss import bc_loss
from vima_tpu.train.trainer import Trainer, make_train_step

__all__ = ["bc_loss", "Trainer", "make_train_step"]
