"""Pure-functional CLIP dual encoder for TPU.

Design notes (TPU-first, not a torch translation):

- Parameters are plain pytrees (nested dicts of ``jnp.ndarray``). All linear
  weights are stored **(in, out)** so the forward is a right-multiplication —
  the natural MXU layout — rather than torch's (out, in).
- The 12 transformer blocks of each tower are **stacked along a leading layer
  axis** and executed with ``lax.scan``: one compiled block program instead of
  12 unrolled copies (faster compiles, identical math, and the layer axis is a
  natural sharding axis for pipeline experiments).
- LoRA adapters are a *separate* stacked pytree threaded through the same scan
  (see :mod:`aiic_tpu.adapters`), so the backbone stays frozen/donatable and
  gradients flow only through the adapter leaves — the JAX equivalent of the
  reference's "train only params with 'lora' in name" rule
  (reference train_lora.py:194-197).
- Numerics: LayerNorm and softmax accumulate in float32 regardless of the
  compute dtype; matmuls request ``preferred_element_type=float32`` so bf16
  activations still accumulate exactly on the MXU.

Behavior parity targets (reference backbone = OpenAI CLIP ViT-B/16, loaded at
reference main.py:152): image tower = conv16 patchify, [CLS]+pos, 12 pre-LN
blocks (w=768, h=12), ln_post on CLS, projection to 512; text tower = 77-ctx
token+pos embed, 12 causal pre-LN blocks (w=512, h=8), ln_final, take the
embedding at the EOT position (argmax of token ids), projection to 512.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from aiic_tpu.models.config import CLIPConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with float32 statistics (parity with torch.nn.LayerNorm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def _gelu(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "quick_gelu":
        return quick_gelu(x)
    return jax.nn.gelu(x, approximate=False)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def lora_delta(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, scaling: float) -> jnp.ndarray:
    """Low-rank delta ``(x @ A @ B) * (alpha/rank)``.

    Matches reference LoRALayer.forward (main.py:30-31, train_lora.py:27-29):
    A is (in, rank), B is (rank, out), B zero-init so a fresh adapter is a
    mathematical no-op.
    """
    down = jnp.dot(x, a.astype(x.dtype), preferred_element_type=jnp.float32)
    up = jnp.dot(down.astype(x.dtype), b.astype(x.dtype), preferred_element_type=jnp.float32)
    return (up * scaling).astype(x.dtype)


def _maybe_lora_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    lora: Optional[Params],
    scaling: float,
    dropout: float = 0.0,
    rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    y = linear(x, w, b)
    if lora is not None:
        d = lora_delta(x, lora["A"], lora["B"], scaling)
        if dropout > 0.0 and rng is not None:
            # Train-time inverted dropout on the LoRA delta — the reference
            # trainer's nn.Dropout on the low-rank path (train_lora.py:16-29).
            # Scaling commutes with the elementwise mask, so masking after
            # lora_delta's alpha/rank multiply is equivalent.
            keep = jax.random.bernoulli(rng, 1.0 - dropout, d.shape)
            d = jnp.where(keep, d / (1.0 - dropout), jnp.zeros_like(d))
        y = y + d
    return y


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def attention(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    mask: Optional[jnp.ndarray],
    lora_out: Optional[Params] = None,
    lora_scaling: float = 1.0,
    attn_impl: str = "xla",
    lora_dropout: float = 0.0,
    lora_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head self-attention with fused QKV.

    ``p['wqkv']`` is (width, 3*width) with columns laid out [Q | K | V]
    (the converter produces this layout from torch's separate/interleaved
    projections). ``mask`` is an additive float mask (S, S) or None.
    """
    bsz, seq, width = x.shape
    head_dim = width // heads

    qkv = linear(x, p["wqkv"], p["bqkv"])  # (B, S, 3W)

    if attn_impl == "auto":
        from aiic_tpu.ops.attention import resolve_attn_impl

        attn_impl = resolve_attn_impl(attn_impl)
    if attn_impl in ("pallas", "pallas_mlp"):
        # Transpose-free fused kernel consuming the projection's raw (B,S,3W)
        # output layout (see ops/attention.fused_attention_qkv).
        from aiic_tpu.ops.attention import fused_attention_qkv

        on_tpu = jax.default_backend() == "tpu"
        out = fused_attention_qkv(qkv, mask, heads=heads, interpret=not on_tpu)
    elif attn_impl == "pallas_vjp":
        # Differentiable: Pallas forward, XLA-derived backward — the training
        # text tower's fast path (the core has no parameters; LoRA never
        # touches the QKV weights).
        from aiic_tpu.ops.attention import fused_attention_qkv_vjp

        on_tpu = jax.default_backend() == "tpu"
        m = (jnp.zeros((seq, seq), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        out = fused_attention_qkv_vjp(qkv, m, heads, not on_tpu)
    else:
        # The reference softmax-attention composition lives in ONE place
        # (ops/attention._attention_qkv_xla) — it is also the function the
        # pallas_vjp backward differentiates, so inference and training
        # gradients share the exact same math.
        from aiic_tpu.ops.attention import _attention_qkv_xla

        out = _attention_qkv_xla(qkv, mask, heads)

    out = out.reshape(bsz, seq, width)
    return _maybe_lora_linear(out, p["wo"], p["bo"], lora_out, lora_scaling,
                              dropout=lora_dropout, rng=lora_rng)


# ---------------------------------------------------------------------------
# Transformer block + tower
# ---------------------------------------------------------------------------


def block(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    mask: Optional[jnp.ndarray],
    gelu_type: str,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    attn_impl: str = "xla",
    lora_dropout: float = 0.0,
    lora_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-LN residual block: x + attn(ln1(x)); x + mlp(ln2(x)).

    LoRA attach points mirror the reference trainer's wrap set
    (train_lora.py:76-98): ``attn.out_proj``, ``mlp.c_fc``, ``mlp.c_proj``.
    """
    l_out = l_fc = l_proj = None
    if lora is not None:
        l_out = lora.get("out_proj")
        l_fc = lora.get("c_fc")
        l_proj = lora.get("c_proj")
    # Distinct dropout keys per attach point (train-time only).
    k_out = k_fc = k_proj = None
    if lora_rng is not None and lora_dropout > 0.0:
        k_out = jax.random.fold_in(lora_rng, 0)
        k_fc = jax.random.fold_in(lora_rng, 1)
        k_proj = jax.random.fold_in(lora_rng, 2)

    if attn_impl == "auto":
        from aiic_tpu.ops.attention import resolve_attn_impl

        attn_impl = resolve_attn_impl(attn_impl)

    # Whole-block training path with a hand-written backward kernel
    # (ops/block_grad): LN1+attention+out_proj+LN2+MLP and all six LoRA
    # cotangents in ONE program recomputing intermediates in VMEM.
    # Requires the full reference attach set and no dropout.
    # Serving-numerics training path: the whole-block kernel pair with int8
    # backbone matmuls (ops/block_grad int8 variant) — the text tower then
    # trains against EXACTLY the int8 composition the serving engine
    # precomputes text features with, instead of bf16 numerics it never
    # serves. Requires quantized text weights in the tree (attn_q/mlp_q).
    if attn_impl == "block_fused_int8":
        from aiic_tpu.ops.block_grad import (
            text_block_int8_supported, text_block_lora_int8,
        )

        if (
            lora is not None
            and all(k in lora for k in ("out_proj", "c_fc", "c_proj"))
            and lora_dropout == 0.0
            and gelu_type == "quick_gelu"
            and "attn_q" in p and "mlp_q" in p
            and text_block_int8_supported(x.shape[1], x.shape[2],
                                          p["mlp"]["w1"].shape[-1], heads)
        ):
            on_tpu = jax.default_backend() == "tpu"
            m = (jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
                 if mask is None else mask.astype(jnp.float32))
            return text_block_lora_int8(
                x, {k: p[k] for k in ("ln1", "attn", "ln2", "mlp")},
                {**p["attn_q"], **p["mlp_q"]},
                {k: lora[k] for k in ("out_proj", "c_fc", "c_proj")},
                m, heads, lora_scaling, not on_tpu,
            )
        attn_impl = "block_fused"  # fall through to the bf16 kernel gate

    if attn_impl == "block_fused":
        from aiic_tpu.ops.block_grad import text_block_supported

        _fits = text_block_supported(
            x.shape[1], x.shape[2], p["mlp"]["w1"].shape[-1], heads,
            x.dtype.itemsize)
    if (
        attn_impl == "block_fused"
        and lora is not None
        and all(k in lora for k in ("out_proj", "c_fc", "c_proj"))
        and lora_dropout == 0.0
        and gelu_type == "quick_gelu"
        and _fits  # larger towers exceed the whole-block VMEM budget
    ):
        from aiic_tpu.ops.block_grad import text_block_lora

        on_tpu = jax.default_backend() == "tpu"
        m = (jnp.zeros((x.shape[1], x.shape[1]), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        return text_block_lora(
            x, {k: p[k] for k in ("ln1", "attn", "ln2", "mlp")},
            {k: lora[k] for k in ("out_proj", "c_fc", "c_proj")},
            m, heads, lora_scaling, not on_tpu,
        )
    if attn_impl == "block_fused":  # config not kernelizable -> fast default
        attn_impl = "pallas_vjp"

    # Whole-block fused int8 kernel (ops/quant.int8_block): attn half + MLP
    # half in ONE program, bit-identical to the kernel pair. MEASURED DEAD
    # END at ViT-B/16 (fused working set only fits at G=1, losing the pair's
    # G=2 row-merge: bench.py 5588 vs 6009 img/s) but a MEASURED WIN where
    # G>=2 fits the fused budget: ViT-B/32 16,702 vs 16,160 img/s (+3.4% —
    # at S=50 the per-layer y1 HBM round trips the fusion removes are a
    # larger share of layer time). AUTO-selected exactly on that rule:
    # engage when the fused estimator fits at G=2; AIIC_FUSED_BLOCK=1
    # forces it anyway (G=1), =0 disables.
    _fused_env = os.environ.get("AIIC_FUSED_BLOCK", "auto")
    if (
        _fused_env != "0"
        and "attn_q" in p
        and "mlp_q" in p
        and attn_impl in ("pallas", "pallas_mlp")
        and l_out is None
        and l_fc is None
        and l_proj is None
        and gelu_type == "quick_gelu"
        and x.dtype == jnp.bfloat16
    ):
        from aiic_tpu.ops.quant import _block_plan, int8_block

        if _fused_env != "1":
            plan = _block_plan(
                x.shape[0], x.shape[1], x.shape[2],
                p["mlp"]["w1"].shape[-1], x.dtype.itemsize)
            if plan is None or plan[1] < 2 or plan[0] != "full":
                # No full-weight G>=2 blocking: the kernel pair wins.
                # Chunked-G2 at B/16 is a MEASURED dead end (5,395 vs 6,049
                # img/s — the chunk-streamed weight re-fetch outweighs the
                # saved y1 round trip, docs/PERF_NOTES.md);
                # AIIC_FUSED_BLOCK=1 forces the plan's best blocking.
                int8_block = None

        if int8_block is not None:
            on_tpu = jax.default_backend() == "tpu"
            aq, mq = p["attn_q"], p["mlp_q"]
            fused = int8_block(
                x, p["ln1"]["scale"], p["ln1"]["bias"],
                aq["wqkv_q"], aq["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                p["attn"]["bo"], mask,
                p["ln2"]["scale"], p["ln2"]["bias"],
                mq["w1_q"], mq["s1"], p["mlp"]["b1"],
                mq["w2_q"], mq["s2"], p["mlp"]["b2"],
                heads=heads, interpret=not on_tpu,
            )
            if fused is not None:
                return fused

    # int8 attention half-block (ops/quant.py): selected when the params
    # carry quantized projection weights (quantize_model) on the bf16
    # inference path. The QKV projection (~67% of half-block FLOPs) runs
    # int8; the output projection stays bf16 (measured faster AND more
    # accurate — see ops/quant._int8_attn_kernel).
    if (
        "attn_q" in p
        and attn_impl in ("pallas", "pallas_mlp")
        and l_out is None
        and x.dtype == jnp.bfloat16
    ):
        from aiic_tpu.ops.quant import int8_ln_qkv_attention

        on_tpu = jax.default_backend() == "tpu"
        q = p["attn_q"]
        x = int8_ln_qkv_attention(
            x, p["ln1"]["scale"], p["ln1"]["bias"],
            q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
            p["attn"]["bo"], mask, heads=heads, interpret=not on_tpu,
        )
    # Whole attention half-block in one kernel (LN1 + QKV proj + attention +
    # out proj + residual, weights VMEM-resident) on the bf16 inference path.
    elif (
        attn_impl in ("pallas", "pallas_mlp")
        and l_out is None
        and x.dtype == jnp.bfloat16
    ):
        from aiic_tpu.ops.attention import fused_ln_qkv_attention

        on_tpu = jax.default_backend() == "tpu"
        x = fused_ln_qkv_attention(
            x, p["ln1"]["scale"], p["ln1"]["bias"],
            p["attn"]["wqkv"], p["attn"]["bqkv"], p["attn"]["wo"], p["attn"]["bo"],
            mask, heads=heads, interpret=not on_tpu,
        )
    else:
        x = x + attention(
            layer_norm(x, p["ln1"]),
            p["attn"],
            heads,
            mask,
            lora_out=l_out,
            lora_scaling=lora_scaling,
            attn_impl=attn_impl,
            lora_dropout=lora_dropout,
            lora_rng=k_out,
        )

    # int8 MLP kernel (ops/quant.py): selected when the params carry
    # quantized MLP weights (quantize_model_mlp) on the bf16 inference path.
    # Measured 21 vs 30 ms per 12 layers against the bf16 kernel on v5e.
    # Gated on the SAME attn_impl set as the int8 attention branch above, so
    # a quantized tree off the pallas path (e.g. attn_impl resolved to "xla"
    # on CPU or under a mesh) runs uniform fp numerics rather than a silent
    # int8-MLP/fp-attention mix.
    if (
        "mlp_q" in p
        and attn_impl in ("pallas", "pallas_mlp")
        and l_fc is None
        and l_proj is None
        and gelu_type == "quick_gelu"
        and x.dtype == jnp.bfloat16
    ):
        from aiic_tpu.ops.quant import int8_ln_mlp

        on_tpu = jax.default_backend() == "tpu"
        q = p["mlp_q"]
        return int8_ln_mlp(
            x, p["ln2"]["scale"], p["ln2"]["bias"],
            q["w1_q"], q["s1"], p["mlp"]["b1"], q["w2_q"], q["s2"], p["mlp"]["b2"],
            interpret=not on_tpu,
        )

    # Fused LN+MLP+residual kernel (ops/mlp.py). Measured neutral vs XLA's
    # own matmul+elementwise fusion on v5e (70.5 vs 69.2 ms/step at B=256),
    # so it is opt-in via attn_impl="pallas_mlp" rather than auto-selected.
    if (
        attn_impl == "pallas_mlp"
        and l_fc is None
        and l_proj is None
        and gelu_type == "quick_gelu"
        and x.dtype == jnp.bfloat16
    ):
        from aiic_tpu.ops.mlp import fused_ln_mlp

        on_tpu = jax.default_backend() == "tpu"
        return fused_ln_mlp(
            x, p["ln2"]["scale"], p["ln2"]["bias"],
            p["mlp"]["w1"], p["mlp"]["b1"], p["mlp"]["w2"], p["mlp"]["b2"],
            interpret=not on_tpu,
        )

    h = layer_norm(x, p["ln2"])
    h = _maybe_lora_linear(h, p["mlp"]["w1"], p["mlp"]["b1"], l_fc, lora_scaling,
                           dropout=lora_dropout, rng=k_fc)
    h = _gelu(h, gelu_type)
    h = _maybe_lora_linear(h, p["mlp"]["w2"], p["mlp"]["b2"], l_proj, lora_scaling,
                           dropout=lora_dropout, rng=k_proj)
    return x + h


def block_cls(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    gelu_type: str,
) -> jnp.ndarray:
    """The final transformer block restricted to the CLS output row.

    The image tower consumes ONLY ``x[:, 0]`` after its last block (OpenAI
    CLIP pools ``ln_post(x[:, 0])`` — the `encode_image` used at
    reference main.py:204/444), so the last block's query, out-projection
    and MLP are needed for exactly one row: K and V still project from
    every row, but the score matrix is (1, S) instead of (S, S) and the
    MLP runs on a single token. This is an exact restriction, not an
    approximation — every dropped row is dead in the full computation.
    At ViT-B/16 geometry it removes ~84% of the final layer's MACs.

    Returns the (B, width) CLS row after the block (pre-ln_post), in fp32.

    Precision note: everything after the K/V projection carries fp32 with NO
    intermediate rounding back to the compute dtype. Rounding to bf16 after
    an XLA matmul makes mesh-vs-single-device outputs differ by one bf16 ULP
    on elements whose fp32 accumulations (order-sensitive at the ~1e-7
    level across batch shapes) straddle a rounding boundary; the fp32 carry
    keeps the shard_map serving path within the engine's 1e-5 parity bar.
    The one-row ops this affects are a negligible share of the block's
    FLOPs — the (B, S, W) K/V projection keeps bf16 MXU inputs.
    """
    bsz, seq, width = x.shape
    dim = width // heads

    h = layer_norm(x, p["ln1"])
    wqkv = p["attn"]["wqkv"].astype(h.dtype)
    bqkv = p["attn"]["bqkv"].astype(jnp.float32)
    # Q for the CLS row only; K and V for every row.
    q = jnp.dot(h[:, 0], wqkv[:, :width], preferred_element_type=jnp.float32)
    q = q + bqkv[:width]  # (B, W) fp32
    kv = jnp.dot(h, wqkv[:, width:], preferred_element_type=jnp.float32)
    kv = kv + bqkv[width:]  # (B, S, 2W) fp32

    qh = q.reshape(bsz, heads, dim)
    kh = kv[..., :width].reshape(bsz, seq, heads, dim)
    vh = kv[..., width:].reshape(bsz, seq, heads, dim)
    scale = dim ** -0.5
    # Same composition as ops.attention._attention_qkv_xla with the query
    # axis fixed to the CLS row (mask is None in the image tower).
    scores = jnp.einsum("bhd,bkhd->bhk", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhk,bkhd->bhd", probs, vh,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(bsz, width)

    out = jnp.dot(attn, p["attn"]["wo"].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    cls = x[:, 0].astype(jnp.float32) + out + p["attn"]["bo"].astype(jnp.float32)
    m = layer_norm(cls, p["ln2"])
    m = jnp.dot(m, p["mlp"]["w1"].astype(jnp.float32),
                preferred_element_type=jnp.float32) + p["mlp"]["b1"].astype(jnp.float32)
    m = _gelu(m, gelu_type)
    m = jnp.dot(m, p["mlp"]["w2"].astype(jnp.float32),
                preferred_element_type=jnp.float32) + p["mlp"]["b2"].astype(jnp.float32)
    return cls + m


def run_tower(
    x: jnp.ndarray,
    blocks: Params,
    heads: int,
    mask: Optional[jnp.ndarray],
    gelu_type: str,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    attn_impl: str = "xla",
    remat: bool = False,
    lora_dropout: float = 0.0,
    lora_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scan the stacked block parameters over the sequence of layers."""
    use_dropout = lora is not None and lora_dropout > 0.0 and lora_rng is not None
    layer_keys = None
    if use_dropout:
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        layer_keys = jax.random.split(lora_rng, n_layers)

    def body(carry, layer_inputs):
        lp = lk = None
        if lora is None:
            bp = layer_inputs
        elif use_dropout:
            bp, lp, lk = layer_inputs
        else:
            bp, lp = layer_inputs
        out = block(
            carry, bp, heads, mask, gelu_type,
            lora=lp, lora_scaling=lora_scaling, attn_impl=attn_impl,
            lora_dropout=lora_dropout if use_dropout else 0.0, lora_rng=lk,
        )
        return out, None

    if remat:
        if remat == "dots":
            # Selective remat: stash matmul outputs through the scan, only
            # recompute the cheap elementwise chains in the backward.
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.checkpoint_dots)
        else:
            body = jax.checkpoint(body)

    if lora is None:
        xs = blocks
    elif use_dropout:
        xs = (blocks, lora, layer_keys)
    else:
        xs = (blocks, lora)
    x, _ = lax.scan(body, x, xs)
    return x


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, C*patch*patch), channel-major within a patch.

    The flatten order matches torch's Conv2d weight layout (out, C, kh, kw) so
    converted conv kernels drop straight in. Patchify-as-reshape+matmul keeps
    the whole embed on the MXU — no convolution needed at stride == kernel.
    """
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * patch * patch)


def encode_image(
    params: Params,
    pixels: jnp.ndarray,
    config: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
) -> jnp.ndarray:
    """Image tower: pixels -> embeddings (B, embed_dim).

    ``pixels`` is either normalized (B, H, W, 3) float (reference-preprocess
    parity path), or **patch-major uint8** (B, N, 3*p*p) — the serving wire
    format where normalization folds algebraically into the embed weight
    (ops.preprocess.patch_norm_constants), making the embed head one matmul
    straight from uint8 with no normalize pass or patchify transposes.

    Reference semantics: ``model.encode_image`` of OpenAI CLIP (used at
    main.py:204, main.py:444, train_lora.py:233).
    """
    v = params["visual"]
    if pixels.ndim == 3:
        if pixels.dtype != jnp.uint8:
            raise ValueError(
                "rank-3 pixels must be patch-major uint8 (B, N, 3*p*p); "
                f"got {pixels.dtype}"
            )
        if "patch_embed_q" in v:
            # int8 embed (serving quantization): exact uint8 activations,
            # int8 weights — ops.preprocess.quantize_patch_embed
            q = v["patch_embed_q"]
            xs8 = jax.lax.bitcast_convert_type(
                pixels ^ jnp.uint8(0x80), jnp.int8)
            y = jax.lax.dot_general(
                xs8, q["wq"], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = y.astype(jnp.float32) * q["wsc"] + q["c2"]
        else:
            from aiic_tpu.ops.preprocess import patch_norm_constants

            s, ms = patch_norm_constants(config.patch_size)
            w = v["patch_embed"].astype(dtype) * jnp.asarray(s)[:, None].astype(dtype)
            c = jnp.dot(
                jnp.asarray(ms).astype(dtype), v["patch_embed"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            x = jnp.dot(pixels.astype(dtype), w, preferred_element_type=jnp.float32) - c
    else:
        x = patchify(pixels.astype(dtype), config.patch_size)
        x = jnp.dot(x, v["patch_embed"].astype(dtype), preferred_element_type=jnp.float32)
    x = x.astype(dtype)

    cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos"].astype(dtype)
    x = layer_norm(x, v["ln_pre"])

    # CLS-row specialization of the final block: exact (the pooled output
    # depends on one row of the last block — see block_cls), ~6% fewer
    # tower MACs at ViT-B/16. Inference-only (visual LoRA adapters are
    # folded into weights before this point, so `lora is None` covers every
    # production path); AIIC_CLS_LAST=0 reverts to the uniform scan.
    cls_last = lora is None and os.environ.get("AIIC_CLS_LAST", "1") != "0"
    if cls_last:
        n_layers = jax.tree.leaves(v["blocks"])[0].shape[0]
        cls_last = n_layers > 0
    if cls_last:
        head = jax.tree.map(lambda a: a[:-1], v["blocks"])
        last = jax.tree.map(lambda a: a[-1], v["blocks"])
        x = run_tower(
            x, head, config.vision.heads, None, config.gelu_type,
            attn_impl=attn_impl, remat=remat,
        )
        x = block_cls(x, last, config.vision.heads, config.gelu_type)
    else:
        x = run_tower(
            x, v["blocks"], config.vision.heads, None, config.gelu_type,
            lora=lora, lora_scaling=lora_scaling, attn_impl=attn_impl,
            remat=remat,
        )
        x = x[:, 0]

    x = layer_norm(x, v["ln_post"])
    return jnp.dot(x, v["proj"].astype(dtype), preferred_element_type=jnp.float32)


def causal_mask(seq: int) -> jnp.ndarray:
    """Additive causal mask, upper triangle = -inf (torch CLIP builds the same)."""
    return jnp.triu(jnp.full((seq, seq), -jnp.inf, dtype=jnp.float32), k=1)


def encode_text(
    params: Params,
    tokens: jnp.ndarray,
    config: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
    lora_dropout: float = 0.0,
    lora_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Text tower: int32 tokens (B, ctx) -> embeddings (B, embed_dim).

    Pooling: the hidden state at the EOT token, located via ``argmax(tokens)``
    because EOT has the highest id in the vocabulary — identical to OpenAI
    CLIP's pooling rule the reference relies on.
    """
    t = params["text"]
    x = t["tok_embed"][tokens].astype(dtype)  # (B, S, W)
    x = x + t["pos"].astype(dtype)

    mask = causal_mask(tokens.shape[1])
    x = run_tower(
        x, t["blocks"], config.text.heads, mask, config.gelu_type,
        lora=lora, lora_scaling=lora_scaling, attn_impl=attn_impl, remat=remat,
        lora_dropout=lora_dropout, lora_rng=lora_rng,
    )

    x = layer_norm(x, t["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return jnp.dot(x, t["proj"].astype(dtype), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def normalize_features(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """L2-normalize along the last axis in float32."""
    xf = x.astype(jnp.float32)
    norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
    return xf / (norm + eps)


def clip_forward(
    params: Params,
    pixels: jnp.ndarray,
    tokens: jnp.ndarray,
    config: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    text_lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
):
    """Joint forward: returns (logits_per_image, logits_per_text).

    Matches the reference training objective's logit computation
    (train_lora.py:241-243): ``logit_scale.exp() * img @ text.T``.
    """
    img = normalize_features(
        encode_image(params, pixels, config, dtype=dtype, attn_impl=attn_impl)
    )
    txt = normalize_features(
        encode_text(
            params, tokens, config, dtype=dtype, attn_impl=attn_impl,
            lora=text_lora, lora_scaling=lora_scaling,
        )
    )
    scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T
