from aiic_tpu.models.config import CLIPConfig, TowerConfig, VIT_B_16, VIT_B_32, VIT_L_14, VIT_L_14_336, TINY_TEST
from aiic_tpu.models.clip import (
    encode_image,
    encode_text,
    clip_forward,
    normalize_features,
)
from aiic_tpu.models.init import init_clip_params

__all__ = [
    "CLIPConfig",
    "TowerConfig",
    "VIT_B_16",
    "VIT_B_32",
    "VIT_L_14",
    "VIT_L_14_336",
    "TINY_TEST",
    "encode_image",
    "encode_text",
    "clip_forward",
    "normalize_features",
    "init_clip_params",
]
