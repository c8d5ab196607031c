"""One engine-config surface shared by the three CLIs (SURVEY.md §5f).

The reference scatters its knobs over three separate argparse blocks with
hardcoded model names and LoRA geometry (main.py:587-595,
train_lora.py:364-374, python-worker/main_API.py:345-352). Here every CLI
declares the SAME engine flags through :class:`EngineArgs` — one dataclass
holding the knobs, one ``add_args`` defining the flags (per-CLI defaults
preserved), one ``build_analyzer`` doing checkpoint loading, LoRA-rank
inference, text-cache fingerprinting, and mesh construction — so the CLIs
cannot drift apart (round-4 VERDICT item #8).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional


def model_presets() -> Dict[str, Any]:
    from aiic_tpu.models.config import (
        TINY_TEST, VIT_B_16, VIT_B_32, VIT_L_14, VIT_L_14_336,
    )

    return {
        "vit_b_16": VIT_B_16,
        "vit_b_32": VIT_B_32,
        "vit_l_14": VIT_L_14,
        "vit_l_14_336": VIT_L_14_336,
        "tiny": TINY_TEST,
    }


@dataclass
class EngineArgs:
    """The engine knobs every CLI shares. Field defaults mirror the
    reference's inference defaults; per-CLI overrides go through
    ``add_args``."""

    model: str = "vit_b_16"
    weights: Optional[str] = None
    dataset_json: str = "interior_dataset.json"
    dtype: str = "float32"
    quantize: bool = False
    use_lora: bool = False
    lora_weights: Optional[str] = None
    lora_rank: Optional[int] = None
    lora_alpha: Optional[float] = None
    wire_format: str = "hwc"
    fast_decode: bool = False
    text_cache: str = "auto"
    mesh_devices: int = 0

    # ------------------------------------------------------------------

    @staticmethod
    def add_args(
        p: argparse.ArgumentParser,
        *,
        dtype_default: str = "float32",
        lora_weights_default: Optional[str] = None,
    ) -> None:
        """Declare the shared engine flags on ``p``. Reference-parity flag
        names stay identical across CLIs; only defaults differ per entry
        point (the batch CLI defaults to the fp32 parity config, the worker
        to the bf16 serving config)."""
        p.add_argument("--model", default="vit_b_16",
                       choices=sorted(model_presets()),
                       help="CLIP preset (reference hardcodes ViT-B/16 at 4 "
                            "sites; the zoo presets share every kernel)")
        p.add_argument("--weights", type=str,
                       help="backbone weights (.npz / .pt OpenAI / HF dir); "
                            "default random init until real weights land")
        p.add_argument("--dataset-json", type=str,
                       default="interior_dataset.json")
        p.add_argument("--dtype", choices=["float32", "bfloat16"],
                       default=dtype_default,
                       help="compute dtype (bfloat16 is ~2x faster on TPU)")
        p.add_argument("--quantize", action="store_true",
                       help="int8 serving config: int8 MLP + QKV-projection "
                            "weights, bf16 output projection (parity-gated "
                            "at cosine 0.9998 vs the fp32 oracle over the "
                            "150 reference images; requires --dtype "
                            "bfloat16)")
        p.add_argument("--use-lora", action="store_true")
        p.add_argument("--lora-weights", type=str,
                       default=lora_weights_default)
        p.add_argument("--lora-rank", type=int, default=None,
                       help="adapter rank; default: inferred from the "
                            "checkpoint (reference checkpoints are rank 4, "
                            "this repo's train-lora default is 16)")
        p.add_argument("--lora-alpha", type=float, default=None,
                       help="adapter alpha; default 2*rank (the reference "
                            "keeps alpha/rank = 2.0 in both variants)")
        p.add_argument("--wire-format", choices=["hwc", "patch"],
                       default="hwc",
                       help="host->device pixel layout: 'patch' = "
                            "patch-major uint8 emitted by the C++ decode "
                            "pool; normalization folds into the embed "
                            "matmul (the bench.py serving wire, "
                            "parity-gated)")
        p.add_argument("--fast-decode", action="store_true",
                       help="DCT-scaled JPEG decode (up to 64x fewer pixels "
                            "through IDCT+resize on large sources; "
                            "quality-approximate, not bit-exact PIL "
                            "preprocessing)")
        p.add_argument("--text-cache", type=str, default="auto",
                       help="precomputed text-feature cache (.npz) path. "
                            "'auto' (default) derives a config-fingerprinted "
                            "path under .aiic_cache/ so restarts skip the "
                            "~60s text precompute; 'none' disables caching")
        p.add_argument("--mesh-devices", type=int, default=0,
                       help="run over an N-device data-parallel mesh (0 = "
                            "single device). The int8/Pallas serving "
                            "kernels stay live per device via shard_map; "
                            "weights replicate; batch buckets round to N")

    @classmethod
    def from_args(cls, args: argparse.Namespace) -> "EngineArgs":
        return cls(
            model=args.model,
            weights=args.weights,
            dataset_json=args.dataset_json,
            dtype=args.dtype,
            quantize=args.quantize,
            use_lora=args.use_lora,
            lora_weights=args.lora_weights,
            lora_rank=args.lora_rank,
            lora_alpha=args.lora_alpha,
            wire_format=args.wire_format,
            fast_decode=args.fast_decode,
            text_cache=args.text_cache,
            mesh_devices=args.mesh_devices,
        )

    # ------------------------------------------------------------------

    def resolve_lora(self):
        """(ckpt dict or None, rank, alpha): load the checkpoint ONCE and
        infer geometry from it — every consumer (text-cache fingerprint,
        analyzer construction) reuses the loaded dict."""
        ckpt = None
        if self.use_lora and self.lora_weights:
            from aiic_tpu.adapters.torch_convert import load_pth_dict

            ckpt = load_pth_dict(self.lora_weights)
        rank = self.lora_rank
        if rank is None and ckpt is not None:
            from aiic_tpu.adapters.torch_convert import infer_lora_rank

            rank = infer_lora_rank(ckpt)
        rank = rank or 4  # reference inference default (main.py:521-522)
        alpha = self.lora_alpha if self.lora_alpha is not None else 2 * rank
        return ckpt, rank, alpha

    def text_cache_path(self, ckpt, rank, alpha) -> Optional[str]:
        """'auto' -> a path fingerprinting EVERYTHING that shapes the text
        tower's parameters and numerics (weights content, LoRA checkpoint
        bytes, merges file, dataset, dtype/quantize flags) — a stale cache
        from a different config must never be picked up."""
        if self.text_cache in (None, "none"):
            return None
        if self.text_cache != "auto":
            return self.text_cache

        import hashlib
        import os

        import numpy as np

        h = hashlib.sha256()
        h.update(repr((self.model, self.weights, self.dtype, self.use_lora,
                       rank, alpha, self.quantize,
                       self.dataset_json)).encode())

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

        _fp_path(self.weights)
        # the merges file changes tokenization -> changes every text feature
        h.update(os.environ.get("AIIC_BPE_PATH", "").encode())
        _fp_path(os.environ.get("AIIC_BPE_PATH"))
        if ckpt is not None:
            for k in sorted(ckpt):
                h.update(k.encode())
                h.update(np.asarray(ckpt[k]).tobytes())
        if os.path.exists(self.dataset_json):
            with open(self.dataset_json, "rb") as f:
                h.update(f.read())
        os.makedirs(".aiic_cache", exist_ok=True)
        return os.path.join(".aiic_cache",
                            f"textcache_{h.hexdigest()[:16]}.npz")

    def build_analyzer(self, *, max_batch: Optional[int] = None,
                       log: Callable[[str], None] = print):
        """Construct the InteriorAnalyzer this config describes."""
        import jax.numpy as jnp

        from aiic_tpu.engine import InteriorAnalyzer
        from aiic_tpu.models.init import load_clip_weights

        config = model_presets()[self.model]
        ckpt, rank, alpha = self.resolve_lora()
        text_cache = self.text_cache_path(ckpt, rank, alpha)
        if text_cache:
            log(f"text cache: {text_cache}")

        mesh = None
        if self.mesh_devices:
            from aiic_tpu.parallel import create_mesh

            mesh = create_mesh(self.mesh_devices, tp=1)  # serving is pure DP

        params = (load_clip_weights(self.weights, config)
                  if self.weights else None)
        kw: Dict[str, Any] = {}
        if max_batch is not None:
            kw["max_batch"] = max_batch
        return InteriorAnalyzer(
            params=params,
            config=config,
            dataset_json=self.dataset_json,
            use_lora=self.use_lora,
            lora_weights_path=ckpt if ckpt is not None else self.lora_weights,
            lora_rank=rank,
            lora_alpha=alpha,
            dtype={"float32": jnp.float32,
                   "bfloat16": jnp.bfloat16}[self.dtype],
            quantize=self.quantize,
            text_cache=text_cache,
            mesh=mesh,
            wire_format=self.wire_format,
            **kw,
        )
