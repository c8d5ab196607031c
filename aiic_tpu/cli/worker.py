"""Worker / serving CLI.

Flag-compatible with the reference worker (python-worker/main_API.py:342-367):
``--export-only --use-lora --lora-weights --max-apartments --batch-size
--confidence``; plus ``--serve`` to expose the REST surface (replacing the
reference's separate Node api-server) with dynamic batching, ``--mongo-uri``
(the reference hardcodes its URI, main_API.py:20), and ``--seed-demo`` to load
the init-mongo.js demo data into the in-memory DB.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Apartment-analysis worker / REST server")
    p.add_argument("--export-only", action="store_true")
    p.add_argument("--use-lora", action="store_true")
    p.add_argument("--lora-weights", type=str)
    p.add_argument("--max-apartments", type=int)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--confidence", type=float, default=0.3)
    p.add_argument("--mongo-uri", type=str, help="defaults to $MONGO_URI; else in-memory DB")
    p.add_argument("--seed-demo", action="store_true")
    p.add_argument("--serve", action="store_true", help="start the REST API instead of one-shot drain")
    p.add_argument("--port", type=int, default=3000)
    p.add_argument("--request-timeout", type=float, default=30.0,
                   help="seconds before a POST /analyze request is failed "
                        "(504) and dead-lettered instead of blocking forever")
    p.add_argument("--dataset-json", type=str, default="interior_dataset.json")
    p.add_argument("--weights", type=str, help="backbone weights")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16",
                   help="compute dtype (bfloat16 is ~2x faster on TPU)")
    p.add_argument("--quantize", action="store_true",
                   help="int8 serving config: int8 MLP + QKV-projection "
                        "weights, bf16 output projection (parity-gated at "
                        "cosine 0.9998 vs the fp32 oracle over the 150 "
                        "reference images; requires --dtype bfloat16)")
    p.add_argument("--lora-rank", type=int, default=None,
                   help="adapter rank; default: inferred from the checkpoint "
                        "(reference checkpoints are rank 4, this repo's "
                        "train-lora default is 16)")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="adapter alpha; default 2*rank (the reference keeps "
                        "alpha/rank = 2.0 in both variants)")
    p.add_argument("--text-cache", type=str, default="auto",
                   help="path to the precomputed text-feature cache (.npz). "
                        "'auto' (default) derives a config-fingerprinted path "
                        "under .aiic_cache/ so restarts skip the ~60s text "
                        "precompute; 'none' disables caching")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="serve over an N-device data-parallel mesh (0 = "
                        "single device). The int8/Pallas serving kernels "
                        "stay live per device via shard_map; weights "
                        "replicate; batch buckets round to N")
    p.add_argument("--wire-format", choices=["hwc", "patch"], default="hwc",
                   help="host->device pixel layout: 'patch' = patch-major "
                        "uint8 emitted by the C++ decode pool; normalization "
                        "folds into the embed matmul (the bench.py serving "
                        "wire, parity-gated)")
    p.add_argument("--fast-decode", action="store_true",
                   help="DCT-scaled JPEG decode on POST /analyze "
                        "(quality-approximate; see docs/PERF_NOTES.md)")
    p.add_argument("--max-queue", type=int, default=256,
                   help="admission-control bound on queued /analyze requests; "
                        "when full, new requests fast-fail with 503 + "
                        "Retry-After instead of queueing past their deadline "
                        "(0 = unbounded)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="dynamic-batcher bucket ceiling for /analyze")
    p.add_argument("--max-wait-ms", type=float, default=10.0,
                   help="max time the oldest queued request waits before its "
                        "batch closes (the occupancy/latency knob)")
    p.add_argument("--max-batch-items", type=int, default=1024,
                   help="max images one POST /analyze-batch request may "
                        "carry (urls + images_b64)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="dispatched-but-unfetched batches kept in flight "
                        "(overlaps device compute/result fetch with the next "
                        "batch's dispatch; 0 = synchronous per-batch serving)")
    args = p.parse_args(argv)

    from aiic_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from aiic_tpu.serve.db import connect_db, seed_demo_data

    db = connect_db(args.mongo_uri)
    if args.seed_demo and hasattr(db, "insert_apartment"):
        seed_demo_data(db)

    if args.export_only:
        path = db.export_analysis_results()
        print(f"exported -> {path}")
        return 0

    from aiic_tpu.engine import InteriorAnalyzer
    from aiic_tpu.models.config import VIT_B_16
    from aiic_tpu.models.init import load_clip_weights

    import jax.numpy as jnp

    # Load the LoRA checkpoint ONCE; every consumer (rank inference here,
    # lora_tree_from_pth inside the analyzer) accepts the pre-loaded dict.
    lora_ckpt = None
    if args.use_lora and args.lora_weights:
        from aiic_tpu.adapters.torch_convert import load_pth_dict

        lora_ckpt = load_pth_dict(args.lora_weights)
    rank = args.lora_rank
    if rank is None and lora_ckpt is not None:
        from aiic_tpu.adapters.torch_convert import infer_lora_rank

        rank = infer_lora_rank(lora_ckpt)
    rank = rank or 4
    alpha = args.lora_alpha if args.lora_alpha is not None else 2 * rank

    import numpy as np

    # Text-feature cache: the features depend on everything that shapes the
    # text tower's parameters and numerics, so 'auto' fingerprints all of it —
    # a stale cache from a different config must never be picked up.
    text_cache = None
    if args.text_cache == "auto":
        import hashlib
        import os

        h = hashlib.sha256()
        h.update(repr((args.weights, args.dtype, args.use_lora, rank, alpha,
                       args.quantize, args.dataset_json)).encode())

        def _fp_path(path):
            """Fingerprint file/dir CONTENT identity (size+mtime per file,
            recursive for HF checkpoint dirs) — a retrained checkpoint at
            the same path must invalidate the cache."""
            if not path or not os.path.exists(path):
                h.update(b"missing")
                return
            if os.path.isdir(path):
                for root, _dirs, files in sorted(os.walk(path)):
                    for fn in sorted(files):
                        fp = os.path.join(root, fn)
                        st = os.stat(fp)
                        h.update(f"{os.path.relpath(fp, path)}:{st.st_size}:"
                                 f"{st.st_mtime_ns}".encode())
            else:
                st = os.stat(path)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())

        _fp_path(args.weights)
        # the merges file changes tokenization -> changes every text feature
        h.update(os.environ.get("AIIC_BPE_PATH", "").encode())
        _fp_path(os.environ.get("AIIC_BPE_PATH"))
        if lora_ckpt is not None:
            for k in sorted(lora_ckpt):
                h.update(k.encode())
                h.update(np.asarray(lora_ckpt[k]).tobytes())
        if os.path.exists(args.dataset_json):
            with open(args.dataset_json, "rb") as f:
                h.update(f.read())
        os.makedirs(".aiic_cache", exist_ok=True)
        text_cache = os.path.join(".aiic_cache", f"textcache_{h.hexdigest()[:16]}.npz")
        print(f"text cache: {text_cache}")
    elif args.text_cache not in (None, "none"):
        text_cache = args.text_cache

    mesh = None
    if args.mesh_devices:
        from aiic_tpu.parallel import create_mesh

        mesh = create_mesh(args.mesh_devices, tp=1)  # serving is pure DP

    # Install the graceful-termination handler BEFORE the engine is built:
    # analyzer construction is the longest startup phase (~minutes of weight
    # upload + text-feature precompute on the chip), and a SIGTERM landing in
    # that window under the default disposition hard-kills the process
    # mid-TPU-RPC — the stale device claim then wedges the chip for many
    # minutes (docs/PERF_NOTES.md environment notes). Raising SystemExit
    # instead unwinds the client cleanly from any phase.
    import signal

    def _graceful(_sig, _frm):
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _graceful)

    params = load_clip_weights(args.weights, VIT_B_16) if args.weights else None
    analyzer = InteriorAnalyzer(
        params=params,
        dataset_json=args.dataset_json,
        use_lora=args.use_lora,
        lora_weights_path=lora_ckpt if lora_ckpt is not None else args.lora_weights,
        lora_rank=rank,
        lora_alpha=alpha,
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype],
        quantize=args.quantize,
        text_cache=text_cache,
        mesh=mesh,
        wire_format=args.wire_format,
    )

    if args.serve:
        from aiic_tpu.serve.app import build_serving_app

        # SIGTERM handler was installed before engine construction (above).
        server, _batcher, _warmed = build_serving_app(
            analyzer, db=db,
            confidence=args.confidence,
            port=args.port,
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            request_timeout=args.request_timeout,
            max_queue=args.max_queue or None,
            fast_decode=args.fast_decode,
            wire_format=args.wire_format,
            pipeline_depth=args.pipeline_depth,
            max_batch_items=args.max_batch_items,
        )
        print(f"serving on :{args.port} (endpoints: /health /ready /apartments "
              f"/process-pending /process/:id /results /export /metrics, "
              f"POST /analyze, POST /analyze-batch)")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    from aiic_tpu.serve.worker import process_apartments_pipeline

    out = process_apartments_pipeline(
        max_apartments=args.max_apartments,
        batch_size=args.batch_size,
        confidence_threshold=args.confidence,
        db=db,
        analyzer=analyzer,
    )
    if out:
        print(f"exported -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
