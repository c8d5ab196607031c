"""Serving load test: concurrent clients against the dynamic batcher.

Measures request latency percentiles and sustained QPS through the same
run_batch path the REST server uses (BASELINE config #5) — without HTTP or
JPEG decode, isolating the batcher+device layer (tools/rest_bench.py
measures the full REST path).

    python tools/serve_bench.py [--clients 16,64] [--per-client 8]
        [--depths 2,0] [--open-rates 100,200,400] [--open-seconds 6]

Closed-loop mode (--clients): N synchronous clients each issue requests
back-to-back — latency-bound lockstep waves, the worst case for batching
(clients resubmit in a stagger that fragments batches when the collector
is instantly available). Open-loop mode (--open-rates): a pacer submits at
a fixed offered QPS regardless of completions — the realistic serving
arrival process; completion latencies come from the futures. Every
(load point, depth) pair runs in THIS process back-to-back so pipelined vs
synchronous comparisons aren't confounded by relay drift between sessions.
"""

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def closed_loop(batcher, img, clients, per_client):
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
    return lats, wall, 0


def open_loop(batcher, img, rate, seconds):
    """Submit at a fixed offered rate; measure completion latency per
    request. Rejections (admission control) and errors count separately."""
    period = 1.0 / rate
    n = int(rate * seconds)
    entries = []
    errors = 0
    t_start = time.perf_counter()
    for i in range(n):
        target = t_start + i * period
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        try:
            fut = batcher.submit(img)
            entries.append((time.perf_counter(), fut))
        except Exception:
            errors += 1
    lats = []
    for t0, fut in entries:
        try:
            fut.result(timeout=120)
            lats.append(time.perf_counter() - t0)
        except Exception:
            errors += 1
    wall = time.perf_counter() - t_start
    return lats, wall, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", default="16")
    ap.add_argument("--per-client", type=int, default=8)
    ap.add_argument("--depths", default="2")
    ap.add_argument("--open-rates", default="",
                    help="offered QPS list: switches to open-loop arrivals")
    ap.add_argument("--open-seconds", type=float, default=6.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from aiic_tpu.engine import InteriorAnalyzer
    from aiic_tpu.serve.app import make_run_batch
    from aiic_tpu.serve.batcher import DynamicBatcher

    analyzer = InteriorAnalyzer(training_data=[], dtype=jnp.bfloat16,
                                max_batch=args.max_batch)

    rng = np.random.default_rng(0)
    # uint8 items: same wire format the REST path uses (normalize on device)
    img = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    print("warming buckets...", file=sys.stderr)
    analyzer.warmup()

    for depth in [int(d) for d in args.depths.split(",")]:
        run_batch, fetch_batch = make_run_batch(
            analyzer, confidence=0.3, max_batch=args.max_batch,
            pipeline_depth=depth)
        batcher = DynamicBatcher(
            run_batch, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            fetch_batch=fetch_batch, pipeline_depth=depth)
        batcher(img)  # warm this batcher's path
        if args.open_rates:
            points = [("open", float(r)) for r in args.open_rates.split(",")]
        else:
            points = [("closed", int(c)) for c in args.clients.split(",")]
        for kind, load in points:
            snap0 = batcher.metrics.snapshot()
            if kind == "open":
                lats, wall, errors = open_loop(batcher, img, load,
                                               args.open_seconds)
            else:
                lats, wall, errors = closed_loop(batcher, img, load,
                                                 args.per_client)
            snap1 = batcher.metrics.snapshot()
            lats.sort()
            n = len(lats)
            if n == 0:
                print(json.dumps({"kind": kind, "load": load,
                                  "errors": errors, "error": "no completions"}),
                      flush=True)
                continue
            batches = snap1.get("batches_total", 0) - snap0.get("batches_total", 0)
            images = snap1.get("images_total", 0) - snap0.get("images_total", 0)
            print(json.dumps({
                "metric": "serve_p50_latency_ms",
                "value": round(lats[n // 2] * 1e3, 1),
                "p90_ms": round(lats[int(n * 0.9)] * 1e3, 1),
                "p99_ms": round(lats[int(n * 0.99)] * 1e3, 1),
                "qps": round(n / wall, 1),
                "kind": kind,
                "load": load,
                "requests": n,
                "errors": errors,
                "pipeline_depth": depth,
                "avg_batch": round(images / batches, 1) if batches else 0,
            }), flush=True)
        batcher.close()


if __name__ == "__main__":
    main()
