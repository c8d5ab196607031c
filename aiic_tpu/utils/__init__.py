from aiic_tpu.utils.batching import bucket_size, pad_batch
from aiic_tpu.utils.platform import enable_compilation_cache
from aiic_tpu.utils.profiling import StageTimer

__all__ = ["bucket_size", "pad_batch", "StageTimer", "enable_compilation_cache"]
