from aiic_tpu.train.trainer import TrainConfig, train_lora, make_train_step, contrastive_loss
from aiic_tpu.train.evaluate import test_trained_lora

__all__ = ["TrainConfig", "train_lora", "make_train_step", "contrastive_loss", "test_trained_lora"]
