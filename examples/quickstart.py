"""Quickstart: the full framework surface in one runnable script.

    python examples/quickstart.py [--reference /root/reference]

Runs on whatever JAX backend is active (AIIC_PLATFORM=cpu to force CPU).
Uses random backbone weights unless --weights points at a real CLIP
checkpoint (OpenAI .pt, HF directory, or this framework's .npz).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--weights")
    args = ap.parse_args()

    from aiic_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax.numpy as jnp

    from aiic_tpu.engine import InteriorAnalyzer
    from aiic_tpu.models.config import VIT_B_16
    from aiic_tpu.models.init import load_clip_weights

    ref = args.reference
    params = load_clip_weights(args.weights, VIT_B_16) if args.weights else None

    # 1) Build the engine: dataset vocabulary + shipped LoRA adapters folded in.
    analyzer = InteriorAnalyzer(
        params=params,
        dataset_json=os.path.join(ref, "interior_dataset.json"),
        use_lora=True,
        lora_weights_path=os.path.join(ref, "lora_models", "comprehensive_lora.pth"),
        dtype=jnp.bfloat16,
    )
    print(f"engine ready: {len(analyzer.category_names)} attribute categories, "
          f"LoRA folded: {analyzer.use_lora}")

    # 2) Single-image detector verdict (reference 3-tuple contract).
    from PIL import Image

    sample = os.path.join(ref, "interior_sample.jpg")
    verdict = analyzer.is_interior_image(Image.open(sample))
    print("detector:", verdict)

    # 3) Batched analysis over files with the reference's JSON result schema.
    import glob

    paths = sorted(glob.glob(os.path.join(ref, "dataset_images", "*.jpg")))[:8]
    results = analyzer.analyze_images_batch(paths, filter_interiors=False)
    one = results[paths[0]]
    print("top style:", one["analysis"]["styles"][0],
          "| top room:", one["analysis"]["room_types"][0])

    # 4) Train LoRA adapters for one epoch and reload them.
    from aiic_tpu.train import TrainConfig, train_lora

    out = train_lora(
        os.path.join(ref, "interior_dataset.json"),
        "/tmp/quickstart_adapters.pth",
        cfg=TrainConfig(epochs=1, batch_size=16, rank=4, alpha=8,
                        attach=("c_fc", "c_proj")),
        image_root=ref,
    )
    print(f"trained: best val loss {out['best_val_loss']:.4f} "
          f"(checkpoint: /tmp/quickstart_adapters.pth)")

    # 5) Production serving: REST + dynamic batcher, single-image and
    #    multi-image protocols, live latency quantiles on /metrics.
    import base64
    import urllib.request

    from aiic_tpu.serve.app import build_serving_app
    from aiic_tpu.serve.db import InMemoryDB
    from aiic_tpu.serve.rest import serve_forever_in_thread

    server, batcher, _warmed = build_serving_app(
        analyzer, db=InMemoryDB(), port=0, max_batch=8,
        warm_buckets=(1, 8), warm_async=False, log=lambda *_: None)
    serve_forever_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with open(sample, "rb") as f:
            img = f.read()
        req = urllib.request.Request(base + "/analyze", data=img, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            single = json.loads(r.read().decode())
        print("REST verdict:", single["is_interior"],
              "| category:", single["detected_category"])
        breq = urllib.request.Request(
            base + "/analyze-batch",
            data=json.dumps({
                "urls": paths[:2],
                "images_b64": [base64.b64encode(img).decode()],
            }).encode(), method="POST")
        with urllib.request.urlopen(breq, timeout=120) as r:
            batch = json.loads(r.read().decode())["results"]
        print(f"REST batch: {len(batch)} results, "
              f"keys={sorted(batch[0])}")
        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            metrics = json.loads(r.read().decode())
        print("live p50:", metrics.get("analyze_p50_ms"), "ms")
    finally:
        server.shutdown()
        batcher.close()

    print(json.dumps({"quickstart": "ok"}))


if __name__ == "__main__":
    main()
