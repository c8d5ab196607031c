"""End-to-end train_lora wall-clock on a production-shaped dataset.

    python tools/train_e2e_bench.py [n_items] [batch] [epochs] [text8]

The reference dataset is template-generated (304 unique prompts across 151
items), so a production-scale corpus keeps a bounded prompt pool while the
image count grows. This tool replicates the reference items to ``n_items``
rows (images on disk stay the same 151 files; the loader caches pixels per
path) and runs the REAL ``train_lora`` loop — feature cache + prompt dedup
engage exactly as they would for a user — reporting wall-clock and
steady-state images/sec including the one-time feature precompute.

Unlike tools/train_bench.py (synthetic step-rate microbench), this drives
the full production path: dataset JSON -> PromptedImageDataset -> cache ->
dedup -> epochs -> best-val checkpoint.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_JSON = "/root/reference/interior_dataset.json"
REF_ROOT = "/root/reference"


def main():
    import jax.numpy as jnp

    from aiic_tpu.data.dataset import load_training_data
    from aiic_tpu.train import TrainConfig, train_lora

    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    text8 = "text8" in sys.argv[4:]

    items = load_training_data(REF_JSON)
    rows = [items[i % len(items)] for i in range(n_items)]
    with tempfile.TemporaryDirectory() as td:
        jp = os.path.join(td, "ds.json")
        with open(jp, "w", encoding="utf-8") as f:
            json.dump({"training_data": rows}, f)

        cfg = TrainConfig(
            epochs=epochs, batch_size=batch, rank=16, alpha=32,
            dtype=jnp.bfloat16,
            quantize_text=text8,
            attn_impl="block_fused" if text8 else "auto",
        )
        epoch_marks = []

        def log(m):
            print(m, file=sys.stderr, flush=True)
            if m.startswith("epoch "):
                epoch_marks.append(time.perf_counter())

        t0 = time.perf_counter()
        out = train_lora(
            jp, os.path.join(td, "demo.pth"), cfg=cfg, image_root=REF_ROOT,
            log=log,
        )
        wall = time.perf_counter() - t0

    steps_per_epoch = (len(rows) - max(1, int(len(rows) * cfg.val_fraction))) \
        // batch
    images_per_epoch = steps_per_epoch * batch
    # Steady state = later epochs (first pays decode + precompute + compile).
    if len(epoch_marks) >= 2:
        steady = (epoch_marks[-1] - epoch_marks[0]) / (len(epoch_marks) - 1)
        value = round(images_per_epoch / steady, 1)
    else:
        steady = wall
        value = round(images_per_epoch / wall, 1)
    print(json.dumps({
        "metric": "train_e2e_images_per_sec_steady",
        "value": value,
        "unit": "img/s",
        "epoch_seconds_steady": round(steady, 2),
        "setup_seconds": round(wall - steady * max(1, len(epoch_marks) - 1), 1),
        "n_items": n_items,
        "batch": batch,
        "epochs": epochs,
        "wall_seconds": round(wall, 1),
        "best_val_loss": round(out["best_val_loss"], 4),
    }))


if __name__ == "__main__":
    main()
