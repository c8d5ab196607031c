"""End-to-end pipeline benchmark (BASELINE config #3): JPEG files ->
native decode+resize pool -> prefetch queue -> uint8 transfer -> fused
normalize/encode/detect/analyze on device.

    python tools/e2e_bench.py [repeat] [batch]

Throughput is host-decode bound in this 1-core container (~77 img/s/core);
the pipeline overlaps decode with device compute, so on an n-core host it
scales until the device limit (~3.9k img/s).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax.numpy as jnp

    from aiic_tpu.data.pipeline import PrefetchingLoader
    from aiic_tpu.engine import InteriorAnalyzer

    paths = sorted(glob.glob("/root/reference/dataset_images/*.jpg")) * repeat
    analyzer = InteriorAnalyzer(
        training_data=[], dtype=jnp.bfloat16, max_batch=batch
    )
    analyzer.warmup([batch])

    loader = PrefetchingLoader(paths, batch_size=batch, size=224, depth=2)
    t0 = time.perf_counter()
    n = 0
    interiors = 0
    for pixels, ok, (start, end) in loader:
        res = analyzer.classify_pixels(pixels)
        good = ok & (
            (res["interior_mass"] > res["non_interior_mass"]) & (res["top_conf"] > 0.3)
        )
        interiors += int(good.sum())
        n += int(ok.sum())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "e2e_jpeg_to_verdict_images_per_sec",
        "value": round(n / dt, 1),
        "unit": "img/s",
        "images": n,
        "interiors": interiors,
        "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
