from dfc_sa_unet_tpu.train.trainer import Trainer, TrainState

__all__ = ["Trainer", "TrainState"]
