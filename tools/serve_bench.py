"""Serving load test: concurrent clients against the dynamic batcher.

Measures end-to-end request latency percentiles and sustained QPS through
the same run_batch path the REST server uses (BASELINE config #5).

    python tools/serve_bench.py [clients] [requests_per_client]
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_client = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax.numpy as jnp

    from aiic_tpu.engine import InteriorAnalyzer
    from aiic_tpu.serve.batcher import DynamicBatcher

    analyzer = InteriorAnalyzer(training_data=[], dtype=jnp.bfloat16, max_batch=64)

    def run_batch(pixels):
        res = analyzer.classify_pixels(pixels)
        return [float(res["interior_mass"][i]) for i in range(pixels.shape[0])]

    batcher = DynamicBatcher(run_batch, max_batch=64, max_wait_ms=10.0)

    rng = np.random.default_rng(0)
    # uint8 items: same wire format the REST path uses (normalize on device)
    img = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    # warm: compile every bucket the load can hit
    print("warming buckets...", file=sys.stderr)
    analyzer.warmup()
    batcher(img)

    lats = []

    def client(_):
        out = []
        for _ in range(per_client):
            t0 = time.perf_counter()
            batcher(img)
            out.append(time.perf_counter() - t0)
        return out

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        for res in pool.map(client, range(clients)):
            lats.extend(res)
    wall = time.perf_counter() - t0

    lats.sort()
    n = len(lats)
    qps = n / wall
    summary = {
        "metric": "serve_p50_latency_ms",
        "value": round(lats[n // 2] * 1e3, 1),
        "p90_ms": round(lats[int(n * 0.9)] * 1e3, 1),
        "p99_ms": round(lats[int(n * 0.99)] * 1e3, 1),
        "qps": round(qps, 1),
        "clients": clients,
        "requests": n,
    }
    print(json.dumps(summary))
    snap = batcher.metrics.snapshot()
    print(f"batcher: avg occupancy {snap.get('last_batch_occupancy', 0):.2f}, "
          f"batches {snap.get('batches_total', 0)}", file=sys.stderr)
    batcher.close()


if __name__ == "__main__":
    main()
