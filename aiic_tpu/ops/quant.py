"""int8 quantized MLP kernel (opt-in).

v5e executes int8×int8 MACs at twice the bf16 rate, and the MLP pair is the
largest single cost in the ViT forward (~31 ms of a 66 ms step at B=256).
This kernel runs ``x + W2·gelu(W1·LN(x))`` with:

- weights quantized **per output channel** to int8 offline
  (:func:`quantize_weight`);
- activations quantized **per row** dynamically inside the kernel
  (symmetric, amax/127);
- int32 accumulation, fp32 dequant/gelu/residual.

Opt-in (``quantize_mlp(params)`` + ``attn_impl="pallas_int8"``): accuracy
for zero-shot classification must be validated against the use case before
making it a default — expect ~0.5-1% relative logit error.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aiic_tpu.ops.attention import LOG2E, exp2_rows


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) fp weight -> (int8 weight, fp32 per-output-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    # Floor mirrors _row_quant's guard: an all-zero column must quantize to
    # zeros, not 0/0 = NaN silently cast to int8.
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _row_quant(h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (rows, d) -> (int8, fp32 per-row scale (rows, 1))."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_mlp_rows(x, ln_s, ln_b, w1, s1, b1, w2, s2, b2, eps):
    """(rows, W) slab: x + int8-MLP(LN(x))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)

    hq, hscale = _row_quant(h)
    acc = jax.lax.dot_general(
        hq, w1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # int8 MACs; 'highest' context would break Mosaic
    )
    y = acc.astype(jnp.float32) * hscale * s1 + b1.astype(jnp.float32)
    y = y * jax.nn.sigmoid(1.702 * y)  # quick_gelu, fp32

    yq, yscale = _row_quant(y)
    acc2 = jax.lax.dot_general(
        yq, w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out = acc2.astype(jnp.float32) * yscale * s2 + b2.astype(jnp.float32)
    return (xf + out).astype(x.dtype)


def _int8_mlp_kernel_3d(
    x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, *, eps: float,
):
    """(G, S, W) image-grouped layout: consumes the tower activation's
    natural tiled layout directly. The flat-rows layout forces XLA to
    materialize a relayout copy on BOTH sides of the custom call ((B,S,W)
    tiles pad S=197 per image; the flat (B·S,W) view doesn't) — measured
    2.4 ms per reshape per step at B=256, 4.7 ms of the 50 ms step.

    The G slabs are merged into ONE (G·S, W) matmul inside VMEM: per-slab
    matmuls pad 197 rows -> 224 sublane tiles EACH (12% dead MACs); the
    merged form pads once."""
    group, seq, width = x_ref.shape
    x = x_ref[:].reshape(group * seq, width)
    out = _int8_mlp_rows(
        x, ln_s_ref[:], ln_b_ref[:], w1_ref[:], s1_ref[:], b1_ref[:],
        w2_ref[:], s2_ref[:], b2_ref[:], eps,
    )
    o_ref[:] = out.reshape(group, seq, width)


def int8_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1_q: jnp.ndarray,
    s1: jnp.ndarray,
    b1: jnp.ndarray,
    w2_q: jnp.ndarray,
    s2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, W) -> (B, S, W): x + int8-MLP(LN(x)).

    Image-grouped 3-D blocking: the kernel consumes the (B, S, W) activation
    in its natural tiled layout (no flattening — a flat-rows interface costs
    a ~2.4 ms relayout copy on each side of the custom call at B=256 because
    (B,S,W) tiling pads S per image while (B·S,W) doesn't).
    """
    del rows  # legacy knob of the flat-rows layout
    bsz, seq, width = x.shape
    mlp_dim = w1_q.shape[-1]

    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    s1 = s1.reshape(1, mlp_dim)
    b1 = b1.reshape(1, mlp_dim)
    s2 = s2.reshape(1, width)
    b2 = b2.reshape(1, width)

    # Scoped-VMEM budget: one (S, mlp_dim) int32 accumulator + fp32 gelu slab
    # per image slab is ~5 MB at ViT-B geometry; weights are int8 (4.5 MB).
    # G=2 measured to fit; fall back to 1 for odd batches.
    group = 2 if bsz % 2 == 0 else 1

    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel_3d, eps=eps),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mlp_dim, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * seq * width * mlp_dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize + 2 * width * mlp_dim,
            transcendentals=bsz * seq * mlp_dim,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2)
    return out


def _int8_attn_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
    wo_ref, so_ref, bo_ref, mask_ref, o_ref,
    *, heads: int, dim: int, scale: float, eps: float,
):
    """Whole attention half-block with int8 projection weights, for a group
    of images per grid step: LN1 -> int8 QKV projection -> per-head attention
    (bf16 core, fp32 softmax) -> int8 output projection -> residual.

    The QKV and output projections are ~89% of the half-block FLOPs
    (2·S·W·3W + 2·S·W·W of 2·S·W·4W + 4·H·S²·D per image); v5e executes
    int8×int8 MACs at twice the bf16 rate, so quantizing just the projections
    approaches the 2x on the dominant term while the softmax core — where
    quantization would hurt accuracy — stays in bf16/fp32. Activations are
    row-quantized dynamically (symmetric amax/127, same scheme as the int8
    MLP kernel); weights are per-output-channel.
    """
    width = heads * dim
    mask = mask_ref[:]
    group, seq, _ = x_ref.shape
    # Both projections (~89% of half-block FLOPs) run ROW-MERGED across the
    # image group — per-slab matmuls pad 197 rows -> 224 sublane tiles each
    # (12% dead MACs), merged they pad once. Only the per-image softmax core
    # runs per slab (each image has its own mask/normalization).
    x = x_ref[:].reshape(group * seq, width)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)

    hq, hscale = _row_quant(h)
    acc = jax.lax.dot_general(
        hq, wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # int8 MACs; see int8 MLP note
    )
    qkv = acc.astype(jnp.float32) * hscale * sqkv_ref[:] + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)  # (G*S, 3W)

    attns = []
    for g in range(group):
        tile = qkv[g * seq:(g + 1) * seq]
        outs = []
        for hd in range(heads):
            q = tile[:, hd * dim:(hd + 1) * dim]
            k = tile[:, width + hd * dim: width + (hd + 1) * dim]
            v = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            # scale·log2(e) folded into Q; softmax via clamped exp2 with the
            # denominator folded past the p@v matmul (ops/attention.exp2_rows)
            q = q * jnp.asarray(scale * LOG2E, q.dtype)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT,
            )
            p = exp2_rows(s + mask)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=None if v.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
            outs.append(o * (1.0 / denom))
        attns.append(jnp.concatenate(outs, axis=-1))  # (S, W) fp32
    attn = jnp.concatenate(attns, axis=0)  # (G*S, W)

    aq, ascale = _row_quant(attn)
    acc2 = jax.lax.dot_general(
        aq, wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    out = acc2.astype(jnp.float32) * ascale * so_ref[:] + bo_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + out).astype(o_ref.dtype).reshape(group, seq, width)


def int8_ln_qkv_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv_q: jnp.ndarray,
    sqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo_q: jnp.ndarray,
    so: jnp.ndarray,
    bo: jnp.ndarray,
    mask=None,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, W) -> (B, S, W): x + OutProj_int8(Attn(QKV_int8(LN(x))))."""
    bsz, seq, width = x.shape
    dim = width // heads
    scale = dim ** -0.5

    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    sqkv = sqkv.reshape(1, 3 * width)
    bqkv = bqkv.reshape(1, 3 * width)
    so = so.reshape(1, width)
    bo = bo.reshape(1, width)
    full_mask = jnp.zeros((seq, seq), jnp.float32) if mask is None else mask.astype(jnp.float32)

    # int8 weights free ~2.7 MB of VMEM vs the bf16 kernel; measured stack
    # fits at G=2 for ViT-B geometry (same grouping rule as the bf16 kernel).
    group = 2 if x.dtype.itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)

    out = pl.pallas_call(
        functools.partial(
            _int8_attn_kernel, heads=heads, dim=dim, scale=scale, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width) + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize + 4 * width * width,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo_q, so, bo, full_mask)
    return out


def quantize_attn_blocks(blocks: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize a tower's stacked attention projection weights; returns
    {wqkv_q, sqkv, wo_q, so} with the leading layer axis preserved."""
    def per_layer(w):
        qs = [quantize_weight(w[i]) for i in range(w.shape[0])]
        return (jnp.stack([q for q, _ in qs]), jnp.stack([s for _, s in qs]))

    wqkv_q, sqkv = per_layer(blocks["attn"]["wqkv"])
    wo_q, so = per_layer(blocks["attn"]["wo"])
    return {"wqkv_q": wqkv_q, "sqkv": sqkv, "wo_q": wo_q, "so": so}


def quantize_mlp_blocks(blocks: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize a tower's stacked MLP weights; returns
    {w1_q, s1, w2_q, s2} with the leading layer axis preserved."""
    def per_layer(w):
        qs = [quantize_weight(w[i]) for i in range(w.shape[0])]
        return (jnp.stack([q for q, _ in qs]), jnp.stack([s for _, s in qs]))

    w1_q, s1 = per_layer(blocks["mlp"]["w1"])
    w2_q, s2 = per_layer(blocks["mlp"]["w2"])
    return {"w1_q": w1_q, "s1": s1, "w2_q": w2_q, "s2": s2}


def quantize_model_mlp(
    params: Dict[str, Any],
    attn: bool = False,
    towers: Tuple[str, ...] = ("visual", "text"),
) -> Dict[str, Any]:
    """Return a params tree with int8-quantized MLP weights attached as
    ``blocks['mlp_q']`` for the given towers (plus ``blocks['attn_q']`` when
    ``attn=True``). ``models.clip.block`` picks the int8 kernels up
    automatically on the bf16 inference path (quantize AFTER any LoRA folding
    so adapters are included in the quantized weights)."""
    out = dict(params)
    for tower in towers:
        t = dict(out[tower])
        blocks = dict(t["blocks"])
        blocks["mlp_q"] = quantize_mlp_blocks(blocks)
        if attn:
            blocks["attn_q"] = quantize_attn_blocks(blocks)
        t["blocks"] = blocks
        out[tower] = t
    return out


def quantize_model(params: Dict[str, Any]) -> Dict[str, Any]:
    """Full int8 serving quantization: MLP + attention projections."""
    return quantize_model_mlp(params, attn=True)
