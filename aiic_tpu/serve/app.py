"""Serving application assembly (BASELINE.json config #5).

Wires the engine into the production REST path the reference sketches across
three processes (api-server/app.js + python-worker/main_API.py + Mongo):

    POST /analyze bytes -> decode (native pool) -> DynamicBatcher
      -> [dispatch bucket -> device program] ─┐ pipelined (depth 2)
      -> [fetch results  -> per-request dict] ┘
      -> JSON response

The batcher runs in PIPELINED mode: the collector thread dispatches bucket
i+1 while the completer thread blocks on bucket i's device results (a ~30 ms
relay round trip per fetch in this container; host/device overlap on direct-
attached hardware). ``pipeline_depth=0`` reverts to synchronous
dispatch+fetch per bucket (the round-3 behavior, kept for A/B benching).

Extracted from cli/worker.py so benches (tools/rest_bench.py) and tests
drive the byte-identical serving assembly the CLI ships.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np


def make_run_batch(analyzer, confidence: float, max_batch: int,
                   pipeline_depth: int) -> Tuple[Callable, Optional[Callable]]:
    """(run_batch, fetch_batch) for DynamicBatcher over the analyzer.
    fetch_batch is None when pipeline_depth == 0 (synchronous mode)."""

    def assemble(res, n: int):
        return [
            {
                "is_interior": bool(
                    res["interior_mass"][i] > res["non_interior_mass"][i]
                    and res["top_conf"][i] > confidence
                ),
                "interior_confidence": float(res["interior_mass"][i]),
                "analysis": analyzer._assemble_analysis(res, i),
            }
            for i in range(n)
        ]

    if pipeline_depth <= 0:
        def run_batch_sync(pixels):
            res = analyzer.classify_pixels(pixels, max_batch=max_batch)
            return assemble(res, pixels.shape[0])

        return run_batch_sync, None

    def run_batch(pixels):
        # dispatch-only: returns a pending handle plus the row count
        return analyzer.dispatch_pixels(pixels, max_batch=max_batch), pixels.shape[0]

    def fetch_batch(handle):
        pending, n = handle
        return assemble(analyzer.fetch_results(pending), n)

    return run_batch, fetch_batch


def make_analyze_bytes(
    analyzer,
    batcher,
    *,
    request_timeout: float = 30.0,
    fast_decode: bool = False,
    wire_format: str = "hwc",
    on_dead_letter: Optional[Callable[[int], None]] = None,
) -> Callable[[bytes], Dict[str, Any]]:
    """bytes -> result dict: decode on the handler thread (native pool,
    PIL fallback for non-JPEG), submit the uint8 crop to the batcher, wait
    bounded by ``request_timeout``."""
    from aiic_tpu.data.images import decode_image_bytes
    from aiic_tpu.data.native_loader import native_available, preprocess_jpeg_batch
    from aiic_tpu.data.preprocess import (
        center_crop_bounds,
        resize_bicubic_numpy,
        resize_target,
    )
    from aiic_tpu.serve.metrics import GLOBAL_METRICS

    use_native = native_available()
    size = analyzer.config.image_size
    # patch wire: the native decode emits patch-major directly; the
    # non-JPEG fallback crop gets the Python repack
    wire_patch = analyzer.config.patch_size if wire_format == "patch" else 0

    def dead_letter(n):
        if on_dead_letter is not None:
            on_dead_letter(n)

    def _submit(item):
        import concurrent.futures

        fut = batcher.submit(item)
        try:
            return fut.result(timeout=request_timeout)
        except (TimeoutError, concurrent.futures.TimeoutError) as e:
            # Only the CLIENT-side wait expiring is counted here; a
            # batch-level timeout already dead-lettered every member via
            # the batcher's on_timeout (counting both doubled the metric).
            if not fut.done():
                fut.cancel()  # still queued -> don't compute a result
                dead_letter(1)
            raise TimeoutError(
                f"request exceeded {request_timeout}s"
            ) from e

    def analyze_bytes(data: bytes):
        # All batcher items are uint8 (normalize fused on device); a mixed
        # uint8/float batch would silently corrupt under np.stack.
        with GLOBAL_METRICS.stages.stage("serve_decode"):
            crop = None
            # preprocess_jpeg_batch has its own Python fallback, so call
            # it even without the native library — --fast-decode then
            # rides PIL's draft mode instead of silently doing nothing.
            if use_native or fast_decode:
                pixels, ok = preprocess_jpeg_batch(
                    [data], size, fast=fast_decode, patch=wire_patch)
                if ok[0]:
                    crop = pixels[0]
            if crop is None:
                arr = decode_image_bytes(data)  # non-JPEG fallback (PNG, ...)
                if arr is None:
                    return {"error": "could not decode image"}
                h, w = arr.shape[:2]
                nw, nh = resize_target(w, h, size)
                res = resize_bicubic_numpy(arr, nw, nh)
                top, left = center_crop_bounds(nw, nh, size)
                crop = res[max(top, 0): max(top, 0) + size,
                           max(left, 0): max(left, 0) + size].astype(np.uint8)
                if wire_patch:
                    from aiic_tpu.ops.preprocess import to_patch_major

                    crop = to_patch_major(crop[None], wire_patch)[0]
        return _submit(crop)

    return analyze_bytes


def build_serving_app(
    analyzer,
    db=None,
    *,
    confidence: float = 0.3,
    port: int = 3000,
    host: str = "127.0.0.1",
    max_batch: int = 64,
    max_wait_ms: float = 10.0,
    request_timeout: float = 30.0,
    max_queue: Optional[int] = 256,
    fast_decode: bool = False,
    wire_format: str = "hwc",
    pipeline_depth: int = 2,
    warm_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64),
    warm_async: bool = True,
    log: Callable[[str], None] = print,
):
    """Assemble the full serving stack. Returns (server, batcher, warmed):
    the caller owns server.serve_forever() / server.shutdown() and
    batcher.close(). ``warmed`` is the Event backing GET /ready."""
    from aiic_tpu.serve.batcher import DynamicBatcher
    from aiic_tpu.serve.metrics import GLOBAL_METRICS
    from aiic_tpu.serve.rest import make_server

    def dead_letter(n):
        GLOBAL_METRICS.inc("analyze_dead_letters_total", n)

    run_batch, fetch_batch = make_run_batch(
        analyzer, confidence, max_batch, pipeline_depth)
    batcher = DynamicBatcher(
        run_batch, max_batch=max_batch, max_wait_ms=max_wait_ms,
        batch_timeout_s=max(request_timeout, 1.0), on_timeout=dead_letter,
        max_queue=max_queue or None,
        fetch_batch=fetch_batch, pipeline_depth=pipeline_depth,
    )
    analyze_bytes = make_analyze_bytes(
        analyzer, batcher, request_timeout=request_timeout,
        fast_decode=fast_decode, wire_format=wire_format,
        on_dead_letter=dead_letter,
    )

    # Serve immediately; warm (text cache + bucket precompile) in the
    # background and flip /ready when done — load balancers gate on
    # /ready, /health stays liveness-only (cold compile here is ~60s).
    warmed = threading.Event()

    def _warm():
        buckets = [b for b in warm_buckets if b <= max_batch]
        log(f"warming classify buckets {buckets}...")
        for attempt in (1, 2):
            try:
                analyzer.warmup(buckets)
                warmed.set()
                log("warmup complete — /ready now true")
                return
            except Exception as e:  # noqa: BLE001 - must not die silently
                log(f"WARMUP FAILED (attempt {attempt}/2): "
                    f"{type(e).__name__}: {e}")
        log("WARMUP permanently failed — /ready will stay 503; "
            "fix the cause and restart")

    if warm_async:
        threading.Thread(target=_warm, daemon=True).start()
    else:
        _warm()
    server = make_server(db=db, analyze_fn=analyze_bytes, port=port, host=host,
                         ready_fn=warmed.is_set)
    return server, batcher, warmed
