"""Attribute-F1 scorer over interior_dataset.json (BASELINE.md tracked metric).

    python tools/eval_f1.py [--dataset-json path] [--image-root dir]
                            [--use-lora --lora-weights path] [--weights path]
                            [--limit N] [--platform cpu|axon]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", default="/root/reference/interior_dataset.json")
    ap.add_argument("--image-root", default=None)
    ap.add_argument("--use-lora", action="store_true")
    ap.add_argument("--lora-weights")
    ap.add_argument("--weights")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--platform", default=os.environ.get("AIIC_PLATFORM", ""))
    args = ap.parse_args()

    if args.platform:
        os.environ["AIIC_PLATFORM"] = args.platform
    from aiic_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from aiic_tpu.data.dataset import load_training_data
    from aiic_tpu.engine import InteriorAnalyzer
    from aiic_tpu.models.config import VIT_B_16
    from aiic_tpu.models.init import load_clip_weights
    from aiic_tpu.train.metrics import attribute_f1

    image_root = args.image_root or os.path.dirname(os.path.abspath(args.dataset_json))
    data = load_training_data(args.dataset_json)
    if args.limit:
        data = data[: args.limit]

    params = load_clip_weights(args.weights, VIT_B_16) if args.weights else None
    analyzer = InteriorAnalyzer(
        params=params,
        training_data=load_training_data(args.dataset_json),
        use_lora=args.use_lora,
        lora_weights_path=args.lora_weights,
        lora_rank=4,
        lora_alpha=8,
    )
    print(json.dumps(attribute_f1(analyzer, data, image_root), indent=2))


if __name__ == "__main__":
    main()
