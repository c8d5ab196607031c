"""Double-buffered host input pipeline (BASELINE.json config #3).

Streams JPEG sources through: native C++ decode+resize pool -> uint8 batches
-> (caller) device transfer + fused normalize/patch-embed/encode. A
background producer thread keeps ``depth`` prepared batches ahead of the
consumer so host decode overlaps device compute — the reference instead
preprocesses synchronously on the host between device calls
(main.py:437-446).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class PrefetchingLoader:
    """Iterates (uint8 pixel batch, ok mask, index range) tuples."""

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int = 256,
        size: int = 224,
        depth: int = 2,
        num_threads: int = 0,
        fast: bool = False,
        patch: int = 0,
    ):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.size = size
        self.depth = depth
        self.num_threads = num_threads
        # DCT-scaled decode (native_loader.preprocess_jpeg_batch fast=True):
        # quality-approximate, for decode-bound deployments
        self.fast = fast
        # patch > 0: batches come out patch-major (n, (size/p)^2, 3*p*p) —
        # the wire format whose normalization folds into the embed matmul;
        # the C++ pool emits it directly (native_loader patch=)
        self.patch = patch

    def __len__(self):
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, Tuple[int, int]]]:
        from aiic_tpu.data.native_loader import preprocess_jpeg_files

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _SENTINEL = object()
        error: List[BaseException] = []

        def produce():
            try:
                for start in range(0, len(self.paths), self.batch_size):
                    chunk = self.paths[start : start + self.batch_size]
                    pixels, ok = preprocess_jpeg_files(
                        chunk, self.size, num_threads=self.num_threads,
                        fast=self.fast, patch=self.patch,
                    )
                    q.put((pixels, ok, (start, start + len(chunk))))
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                # Propagate producer failures to the consumer instead of
                # silently truncating the stream: a swallowed exception here
                # would make analyze_images_batch return PARTIAL results with
                # rc=0 (every path after the failure point simply missing).
                error.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                if error:
                    raise error[0]
                break
            yield item
