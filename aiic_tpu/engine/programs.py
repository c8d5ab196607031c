"""The jit-compiled inference programs.

The reference runs the detector **per image at batch 1 inside download
threads** (hot-loop A, main.py:201-220) and then re-encodes kept images in
batches (hot-loop B, main.py:442-446), bouncing features device→host→device
(main.py:446-448). Here the whole thing is ONE XLA program per batch bucket:

    pixels ─ encode_image ─ normalize ─┬─ detector softmax + masses + top-1
                                       └─ per-category masked softmax + top-5

so each image is encoded exactly once and nothing leaves the device until the
final small result tensors.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aiic_tpu.models.clip import encode_image, encode_text, normalize_features
from aiic_tpu.models.config import CLIPConfig


def detect_logits(
    feats: jnp.ndarray, det_text: jnp.ndarray, interior_count: int
) -> Dict[str, jnp.ndarray]:
    """Batched detector rule (reference main.py:208-220).

    feats: (B, D) L2-normalized image features.
    det_text: (K, D) L2-normalized detector-category text features.
    """
    sims = jax.nn.softmax(100.0 * feats @ det_text.T, axis=-1)  # (B, K)
    top_conf = jnp.max(sims, axis=-1)
    top_idx = jnp.argmax(sims, axis=-1)
    interior_mass = jnp.sum(sims[:, :interior_count], axis=-1)
    non_interior_mass = jnp.sum(sims[:, interior_count:], axis=-1)
    return {
        "top_conf": top_conf,
        "top_idx": top_idx,
        "interior_mass": interior_mass,
        "non_interior_mass": non_interior_mass,
    }


def analyze_topk(
    feats: jnp.ndarray,
    cat_text: jnp.ndarray,
    cat_mask: jnp.ndarray,
    k: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched per-category attribute scoring (reference main.py:451-459).

    feats: (B, D); cat_text: (C, N, D) zero-padded; cat_mask: (C, N) bool.
    Returns top-k (values, indices), each (B, C, k); padded slots score 0.
    """
    sims = jnp.einsum("bd,cnd->bcn", feats, cat_text)  # (B, C, N)
    sims = jnp.where(cat_mask[None], 100.0 * sims, -jnp.inf)
    probs = jax.nn.softmax(sims, axis=-1)
    probs = jnp.where(cat_mask[None], probs, 0.0)
    k = min(k, probs.shape[-1])  # vocabularies smaller than k
    vals, idx = jax.lax.top_k(probs, k)
    return vals, idx


def classify_batch(
    params: Dict[str, Any],
    pixels: jnp.ndarray,
    det_text: jnp.ndarray,
    cat_text: jnp.ndarray,
    cat_mask: jnp.ndarray,
    *,
    config: CLIPConfig,
    interior_count: int,
    dtype: jnp.dtype,
    attn_impl: str,
    topk: int = 5,
) -> Dict[str, jnp.ndarray]:
    """Single fused program: (optionally normalize) + encode once, detect + analyze.

    ``pixels`` may be float (already normalized, reference-preprocess parity
    path), HWC uint8 (serving fast path: 4x smaller host->device transfer,
    normalization fused on device — see ops/preprocess), or patch-major
    uint8 (B, N, 3*p*p) (the fastest wire: normalization folds into the
    embed matmul inside encode_image — ops.preprocess.patch_norm_constants).
    """
    if pixels.dtype == jnp.uint8 and pixels.ndim == 4:
        from aiic_tpu.ops.preprocess import normalize_u8

        pixels = normalize_u8(pixels, dtype=dtype)
    feats = normalize_features(
        encode_image(params, pixels, config, dtype=dtype, attn_impl=attn_impl)
    )
    out = detect_logits(feats, det_text, interior_count)
    vals, idx = analyze_topk(feats, cat_text, cat_mask, k=topk)
    out["topk_vals"] = vals
    out["topk_idx"] = idx
    out["features"] = feats
    return out


def encode_texts_program(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    *,
    config: CLIPConfig,
    dtype: jnp.dtype,
    attn_impl: str,
) -> jnp.ndarray:
    """Normalized text features for a (N, ctx) token batch — used once at
    engine construction to build the detector/category caches (the TPU
    counterpart of the reference's text-feature precompute, main.py:296-311).
    """
    return normalize_features(
        encode_text(params, tokens, config, dtype=dtype, attn_impl=attn_impl)
    )


def make_classify_fn(
    config: CLIPConfig,
    interior_count: int,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "auto",
    matmul_precision: Optional[str] = None,
    donate_pixels: bool = False,
    jit: bool = True,
):
    """Build the jitted classify program (closed over static config).

    ``jit=False`` returns the raw traced function — used by
    ``parallel.make_sharded_classify_fn`` which applies its own
    shard_map + jit wrapping for multi-chip serving."""

    def fn(params, pixels, det_text, cat_text, cat_mask):
        # The precision context must be live at *trace* time, i.e. inside the
        # traced body — wrapping the jit call site would be a no-op.
        if matmul_precision:
            with jax.default_matmul_precision(matmul_precision):
                return classify_batch(
                    params, pixels, det_text, cat_text, cat_mask,
                    config=config, interior_count=interior_count,
                    dtype=dtype, attn_impl=attn_impl,
                )
        return classify_batch(
            params, pixels, det_text, cat_text, cat_mask,
            config=config, interior_count=interior_count,
            dtype=dtype, attn_impl=attn_impl,
        )

    if not jit:
        return fn
    donate = (1,) if donate_pixels else ()
    return jax.jit(fn, donate_argnums=donate)
