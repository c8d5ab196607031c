from aiic_tpu.train.trainer import (
    TrainConfig,
    contrastive_loss,
    make_train_step,
    precompute_image_features,
    train_lora,
)
from aiic_tpu.train.evaluate import test_trained_lora

__all__ = [
    "TrainConfig",
    "train_lora",
    "make_train_step",
    "contrastive_loss",
    "precompute_image_features",
    "test_trained_lora",
]
