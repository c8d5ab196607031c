"""Full golden-parity report over all 150 reference dataset images.

Runs both frameworks — this one and a torch CLIPModel oracle sharing the same
weights — over `dataset_images/` with identical PIL preprocessing, and reports
the BASELINE.md agreement metric (target ≥0.999) on the 100·img@text.T logit
matrices plus detector-verdict agreement.

With no pretrained weights in this environment the oracle uses seeded random
weights (the converter path is identical for real weights). Pass a weights
file to score real checkpoints:

    python tools/parity_report.py [--weights path] [--limit N]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference-root", default="/root/reference")
    ap.add_argument("--weights", help="real CLIP weights (.pt OpenAI / HF dir)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--platform", default="cpu", help="jax platform for the run")
    ap.add_argument("--matmul-precision", default="highest",
                    help="matmul precision for the JAX side (on TPU, 'highest' "
                         "is required to meet the 0.999 bar in fp32)")
    ap.add_argument("--attn-impl", default="xla", choices=["xla", "pallas", "auto"])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="compute dtype for the JAX side (the serving config "
                         "is bfloat16)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 MLP + attention projection weights — gates the "
                         "exact bench.py serving config against the fp32 oracle")
    ap.add_argument("--wire", default="hwc", choices=["hwc", "patch"],
                    help="JAX-side input form: 'hwc' = normalized float "
                         "(reference-exact), 'patch' = patch-major uint8 "
                         "with normalization folded into the embed matmul "
                         "(the bench.py wire format)")
    args = ap.parse_args()

    os.environ.setdefault("AIIC_PLATFORM", args.platform)
    from aiic_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import torch
    from PIL import Image

    from aiic_tpu.data.preprocess import preprocess_pil
    from aiic_tpu.data.tokenizer import tokenize
    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.models import VIT_B_16, encode_image, encode_text, normalize_features
    from aiic_tpu.models.init import from_hf_clip_state_dict, load_clip_weights

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from test_parity_torch import _hf_vit_b16

    if args.weights and os.path.isdir(args.weights):
        # Real weights as an HF checkpoint directory: the SAME directory
        # becomes both the torch oracle and (via the tested converter) our
        # params — one command gates everything (VERDICT weak #3).
        from transformers import CLIPModel

        model = CLIPModel.from_pretrained(args.weights)
        model.eval()
        params = load_clip_weights(args.weights, VIT_B_16)
        print(f"oracle: CLIPModel.from_pretrained({args.weights})", file=sys.stderr)
    elif args.weights:
        # OpenAI .pt / .npz: no torch-oracle constructor for this layout in
        # the container; the converter path itself is round-trip tested.
        params = load_clip_weights(args.weights, VIT_B_16)
        model = None
        print("NOTE: torch oracle skipped for non-HF external weights "
              "(converter round-trip is tested; use an HF checkpoint dir "
              "for the full oracle gate)", file=sys.stderr)
        return
    else:
        model = _hf_vit_b16()
        params = from_hf_clip_state_dict(model.state_dict(), VIT_B_16)

    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    if args.quantize:
        from aiic_tpu.ops.quant import quantize_model

        if dtype != jnp.bfloat16:
            ap.error("--quantize requires --dtype bfloat16 (the serving config)")
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        params = quantize_model(params)
        print("serving config: bf16 + int8 MLP/attn-projection weights", file=sys.stderr)
    elif dtype == jnp.bfloat16:
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    paths = sorted(glob.glob(f"{args.reference_root}/dataset_images/*.jpg"))
    if args.limit:
        paths = paths[: args.limit]
    print(f"scoring {len(paths)} images...", file=sys.stderr)

    pixels = np.stack([preprocess_pil(Image.open(p)) for p in paths])
    if args.wire == "patch":
        from aiic_tpu.data.preprocess import preprocess_pil_u8
        from aiic_tpu.ops.preprocess import to_patch_major

        our_pixels = to_patch_major(
            np.stack([preprocess_pil_u8(Image.open(p)) for p in paths]),
            VIT_B_16.patch_size,
        )
        print("JAX side: patch-major uint8 wire (folded normalize)", file=sys.stderr)
    else:
        our_pixels = pixels
    tokens = tokenize(DETECTOR_CATEGORIES).astype(np.int64)

    with torch.no_grad():
        chunks = []
        for i in range(0, len(pixels), 16):
            chunk = torch.from_numpy(pixels[i : i + 16]).permute(0, 3, 1, 2)
            chunks.append(model.get_image_features(pixel_values=chunk))
        rimg = torch.cat(chunks)
        rtxt = model.get_text_features(input_ids=torch.from_numpy(tokens))
        rimg = rimg / rimg.norm(dim=-1, keepdim=True)
        rtxt = rtxt / rtxt.norm(dim=-1, keepdim=True)
        ref_logits = (100.0 * rimg @ rtxt.T).numpy()

    def enc_fn(p, x):
        with jax.default_matmul_precision(args.matmul_precision):
            return normalize_features(
                encode_image(p, x, VIT_B_16, dtype=dtype, attn_impl=args.attn_impl)
            )

    def txt_fn(p, t):
        with jax.default_matmul_precision(args.matmul_precision):
            return normalize_features(
                encode_text(p, t, VIT_B_16, dtype=dtype, attn_impl=args.attn_impl)
            )

    enc = jax.jit(enc_fn)
    feats = np.concatenate([
        np.asarray(enc(params, our_pixels[i : i + 16])) for i in range(0, len(our_pixels), 16)
    ])
    otxt = np.asarray(jax.jit(txt_fn)(params, tokens.astype(np.int32)))
    our_logits = 100.0 * feats @ otxt.T

    a, b = our_logits.ravel(), ref_logits.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    corr = float(np.corrcoef(a, b)[0, 1])
    maxd = float(np.abs(a - b).max())

    def verdict(lg):
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return (p[:, :INTERIOR_COUNT].sum(-1) > p[:, INTERIOR_COUNT:].sum(-1)) & (p.max(-1) > 0.3)

    agree = float((verdict(our_logits) == verdict(ref_logits)).mean())
    print(json.dumps({
        "images": len(paths),
        "logit_cosine_agreement": round(cos, 6),
        "logit_pearson": round(corr, 6),
        "max_abs_logit_diff": round(maxd, 5),
        "detector_verdict_agreement": agree,
        "passes_0999_bar": cos >= 0.999,
    }))


if __name__ == "__main__":
    main()
