from aiic_tpu.data.tokenizer import ClipTokenizer, tokenize
from aiic_tpu.data.dataset import (
    load_training_data,
    extract_all_categories,
    build_category_prompts,
    build_training_prompts,
)
from aiic_tpu.data.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_pil,
    preprocess_numpy_batch,
)

__all__ = [
    "ClipTokenizer",
    "tokenize",
    "load_training_data",
    "extract_all_categories",
    "build_category_prompts",
    "build_training_prompts",
    "CLIP_MEAN",
    "CLIP_STD",
    "preprocess_pil",
    "preprocess_numpy_batch",
]
