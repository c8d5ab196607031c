"""Static-shape batching helpers.

XLA compiles one program per distinct input shape; padding request batches to
power-of-two buckets bounds the number of compilations (log2(max_batch) + 1)
while keeping padding waste < 2x — the standard TPU serving trade-off.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def bucket_size(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch."""
    if n <= 0:
        raise ValueError("empty batch")
    b = 1
    while b < n:
        b <<= 1
    return min(b, max(max_batch, n))


def pad_batch(batch: np.ndarray, size: int) -> Tuple[np.ndarray, int]:
    """Zero-pad the leading axis to ``size``; returns (padded, valid_count)."""
    n = batch.shape[0]
    if n == size:
        return batch, n
    if n > size:
        raise ValueError(f"batch {n} exceeds bucket {size}")
    pad = np.zeros((size - n,) + batch.shape[1:], dtype=batch.dtype)
    return np.concatenate([batch, pad], axis=0), n
