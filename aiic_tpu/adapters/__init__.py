from aiic_tpu.adapters.lora import (
    LoRAConfig,
    init_text_lora,
    init_visual_lora,
    init_tower_lora,
    fold_text_lora,
    fold_visual_lora,
    fold_tower_lora,
    lora_param_count,
)
from aiic_tpu.adapters.torch_convert import (
    lora_tree_from_pth,
    lora_tree_to_pth_dict,
    save_lora_pth,
)

__all__ = [
    "LoRAConfig",
    "init_text_lora",
    "init_visual_lora",
    "init_tower_lora",
    "fold_text_lora",
    "fold_visual_lora",
    "fold_tower_lora",
    "lora_param_count",
    "lora_tree_from_pth",
    "lora_tree_to_pth_dict",
    "save_lora_pth",
]
