from aiic_tpu.ops.preprocess import (
    normalize_u8,
    device_preprocess_fixed,
    make_resize_mats,
)

__all__ = ["normalize_u8", "device_preprocess_fixed", "make_resize_mats"]
