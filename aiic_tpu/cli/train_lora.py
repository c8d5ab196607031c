"""Training CLI — flag-compatible with the reference trainer
(train_lora.py:363-387): ``--json-path --save-path --epochs --batch-size
--lr --rank --alpha --test``."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="LoRA fine-tuning on TPU")
    p.add_argument("--json-path", type=str, default="interior_dataset.json")
    p.add_argument("--save-path", type=str, default="lora_models/comprehensive_lora_improved.pth")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--alpha", type=int, default=32)
    p.add_argument("--dropout", type=float, default=0.0,
                   help="dropout on the LoRA delta, train-time only "
                        "(reference LoRALayer dropout, default 0.0)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32",
                   help="compute dtype for the training step (reference "
                        "trains fp32 on CPU / fp16 autocast on CUDA; bf16 "
                        "is the TPU-native fast path, adapters and optimizer "
                        "state stay fp32)")
    p.add_argument("--quantize-image", action="store_true",
                   help="run the frozen image tower with the int8 serving "
                        "numerics (bf16 + int8 kernels) so adapters train "
                        "against the exact features served in production")
    p.add_argument("--quantize-text", action="store_true",
                   help="run the differentiated TEXT tower with the int8 "
                        "serving numerics via the whole-block int8 kernel "
                        "pair (requires --attn-impl block_fused; gradients "
                        "use the straight-through estimator)")
    p.add_argument("--no-dedup-prompts", action="store_true",
                   help="encode every batch row's tokens densely instead of "
                        "encoding the unique-prompt pool once per step and "
                        "gathering by index (identical numerics; dedup only "
                        "engages when the pool fits the batch and dropout "
                        "is 0)")
    p.add_argument("--no-feature-cache", action="store_true",
                   help="recompute the frozen image tower every step "
                        "(reference behavior) instead of caching per-image "
                        "features once — same loss trajectory, ~2x slower "
                        "steps; the cache is on by default")
    p.add_argument("--test", action="store_true", help="evaluate a trained adapter")
    p.add_argument("--model", default="vit_b_16",
                   choices=["vit_b_16", "vit_b_32", "vit_l_14",
                            "vit_l_14_336", "tiny"],
                   help="CLIP preset (shared zoo with the inference CLIs; "
                        "reference hardcodes ViT-B/16)")
    p.add_argument("--weights", type=str, help="backbone weights (.npz / .pt / HF)")
    p.add_argument("--image-root", type=str, help="base dir for dataset image paths")
    p.add_argument("--resume", action="store_true",
                   help="continue from {save-path}.state.npz (full state)")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="train over an N-device ('data','model') mesh "
                        "(0 = single device); batch placement goes through "
                        "the multi-host input seam")
    p.add_argument("--tp", type=int, default=None,
                   help="model-axis size within --mesh (default: auto)")
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "xla", "pallas_vjp", "block_fused"],
                   help="text-tower attention/backward implementation. "
                        "'block_fused' = whole-block backward kernel, "
                        "+5-6%% steady-state over the default but a "
                        "~12-22 min first compile on this backend")
    args = p.parse_args(argv)

    from aiic_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from aiic_tpu.cli.common import model_presets
    from aiic_tpu.models.init import load_clip_weights

    config = model_presets()[args.model]
    params = load_clip_weights(args.weights, config) if args.weights else None

    if args.test:
        from aiic_tpu.train import test_trained_lora

        acc = test_trained_lora(
            args.json_path, args.save_path, params=params, config=config,
            rank=args.rank, alpha=args.alpha, batch_size=args.batch_size,
            image_root=args.image_root,
        )
        print(f"retrieval accuracy: {acc:.4f}")
        return 0

    import jax.numpy as jnp

    from aiic_tpu.train import TrainConfig, train_lora

    mesh = None
    if args.mesh:
        from aiic_tpu.parallel import create_mesh

        mesh = create_mesh(args.mesh, tp=args.tp)

    out = train_lora(
        args.json_path,
        args.save_path,
        params=params,
        config=config,
        cfg=TrainConfig(
            epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
            rank=args.rank, alpha=args.alpha, lora_dropout=args.dropout,
            quantize_image=args.quantize_image,
            quantize_text=args.quantize_text, dtype=jnp.dtype(args.dtype),
            attn_impl=args.attn_impl,
            cache_image_features=not args.no_feature_cache,
            dedup_prompts=not args.no_dedup_prompts,
        ),
        image_root=args.image_root,
        mesh=mesh,
        resume=args.resume,
    )
    print(f"best val loss: {out['best_val_loss']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
