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

from aiic_tpu.ops.attention import LOG2E, _denom_guard, _mm_prec, exp2_rows


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


def _gelu_exp2(y: jnp.ndarray) -> jnp.ndarray:
    # quick_gelu via exp2: sigmoid(1.702 y) = 1/(1 + 2^(-1.702·log2(e)·y)).
    # Mosaic lowers exp2 faster than its `logistic` path; measured -0.3 ms on
    # the 12-layer stack at B=256 with cosine 1.000000 vs jax.nn.sigmoid.
    return y * (1.0 / (1.0 + jnp.exp2(jnp.float32(-1.702 * LOG2E) * y)))


def _int8_mlp_rows(x, ln_s, ln_b, w1, s1, b1, w2, s2, b2, eps, n_chunks=1):
    """(rows, W) slab: x + int8-MLP(LN(x)).

    ``n_chunks > 1`` runs the hidden (mlp_dim) axis in chunks with
    per-(row, chunk) activation quantization — the exact numerics of the
    chunked Pallas kernel, kept here as its XLA reference/fallback."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)

    hq, hscale = _row_quant(h)
    mlp_dim = w1.shape[-1]
    chunk = mlp_dim // n_chunks

    def _part(sl):
        acc = jax.lax.dot_general(
            hq, w1[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,  # int8 MACs; 'highest' context would break Mosaic
        )
        y = acc.astype(jnp.float32) * hscale * s1[:, sl] + b1[:, sl].astype(jnp.float32)
        y = _gelu_exp2(y)
        yq, yscale = _row_quant(y)
        acc2 = jax.lax.dot_general(
            yq, w2[sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return acc2.astype(jnp.float32) * yscale * s2

    if n_chunks == 1:
        out = _part(slice(0, mlp_dim)) + b2.astype(jnp.float32)
        return (xf + out).astype(x.dtype)
    # Chunked: mirror the chunked kernel's fp32 summation order exactly
    # (residual seeds the accumulator; b2 lands last) so kernel vs reference
    # comparisons are bit-comparable.
    total = xf
    for c in range(n_chunks):
        total = total + _part(slice(c * chunk, (c + 1) * chunk))
    return (total + b2.astype(jnp.float32)).astype(x.dtype)


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


# Scoped-VMEM budget for kernel blocking decisions. The hard ceiling is
# ~16 MB on v5e; the estimators below count PEAK-LIVE buffers (Mosaic
# reuses e.g. the int32 accumulator's storage for the fp32 gelu slab), and
# 14 MB leaves headroom for its own temporaries. Calibration anchors: the
# ViT-B/16 estimates (MLP 13.1 MB, attention 11.8 MB at G=2) are measured
# to fit on hardware; ViT-L/14 at G=2 (~21 MB) is correctly rejected.
_VMEM_BUDGET = 14 * 1024 * 1024


def _mlp_vmem_bytes(group: int, seq: int, width: int, mlp_dim: int,
                    itemsize: int) -> int:
    rows = group * seq
    return (
        2 * rows * width * itemsize       # x in + out blocks
        + 2 * width * mlp_dim             # int8 weight pair
        + rows * width * 4                # xf (live until the residual add)
        + rows * mlp_dim * 4              # int32 accumulator / fp32 gelu slab
        + rows * mlp_dim                  # int8 quantized gelu output
    )


def _mlp_chunk_vmem_bytes(group: int, seq: int, width: int, mlp_dim: int,
                          n_chunks: int, itemsize: int) -> int:
    """Peak-live estimate for the hidden-axis-chunked kernel: only one
    (W, M/C)+(M/C, W) weight-chunk pair and one (rows, M/C) slab are
    resident per grid step; the fp32 accumulator and quantized LN output
    persist in scratch across the chunk loop."""
    rows = group * seq
    chunk = mlp_dim // n_chunks
    return (
        2 * rows * width * itemsize       # x in + out blocks
        + 2 * width * chunk               # int8 weight chunk pair
        + rows * width * 4                # fp32 residual/output accumulator (scratch)
        + rows * width * 4                # h fp32 (transient, chunk 0)
        + rows * width                    # hq int8 (scratch)
        + rows * chunk * 4                # int32 accumulator / fp32 gelu slab
        + rows * chunk                    # int8 quantized gelu output
    )


def _mlp_plan(bsz: int, seq: int, width: int, mlp_dim: int,
              itemsize: int) -> Tuple[str, int, int]:
    """Kernel-blocking decision for the int8 MLP: ("full", G, 1) when the
    whole (W, M) weight pair fits VMEM at some image group G; otherwise
    ("chunked", G, C) streaming the hidden axis in C chunks — preferring the
    LARGEST group first (row-merging across images amortizes the seq->sublane
    padding: 2x257 -> 544 pads 5.8% vs 257 -> 288's 12%), then the smallest
    chunk count; ("xla", 1, 1) when nothing fits."""
    group = 2 if bsz % 2 == 0 else 1
    while group > 1 and _mlp_vmem_bytes(group, seq, width, mlp_dim,
                                        itemsize) > _VMEM_BUDGET:
        group //= 2
    if _mlp_vmem_bytes(group, seq, width, mlp_dim, itemsize) <= _VMEM_BUDGET:
        return ("full", group, 1)
    for g in (2, 1):
        if bsz % g:
            continue
        c = 2
        while mlp_dim % c == 0 and mlp_dim // c >= 128:
            if _mlp_chunk_vmem_bytes(g, seq, width, mlp_dim, c,
                                     itemsize) <= _VMEM_BUDGET:
                return ("chunked", g, c)
            c *= 2
    return ("xla", 1, 1)


def _int8_mlp_chunk_kernel(
    x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, acc_ref, hq_ref, hs_ref, *, eps: float, n_chunks: int,
):
    """Hidden-axis (mlp_dim) chunked int8 MLP: grid (batch groups, chunks).
    Geometries whose full (W, M) weight pair + (rows, M) slab exceed VMEM
    (e.g. ViT-L/14: ~15.8 MB at G=1) stream the hidden axis in C chunks:
    chunk c computes gelu(hq @ w1[:, c]) and accumulates its c_proj partial
    product into a persistent fp32 scratch that already carries the
    residual. Activation quantization for the second matmul is per
    (row, chunk) — FINER granularity than the unchunked kernel's per-row
    scale (each chunk gets its own amax), mirrored exactly by
    ``_int8_mlp_rows(n_chunks=C)``."""
    group, seq, width = x_ref.shape
    rows = group * seq
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _first():
        xf = x_ref[:].reshape(rows, width).astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
        hq, hscale = _row_quant(h)
        hq_ref[:] = hq
        hs_ref[:] = hscale
        acc_ref[:] = xf  # residual seeds the output accumulator

    acc = jax.lax.dot_general(
        hq_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    y = acc.astype(jnp.float32) * hs_ref[:] * s1_ref[:] + b1_ref[:].astype(jnp.float32)
    y = _gelu_exp2(y)
    yq, yscale = _row_quant(y)
    acc2 = jax.lax.dot_general(
        yq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc_ref[:] += acc2.astype(jnp.float32) * yscale * s2_ref[:]

    @pl.when(c == n_chunks - 1)
    def _last():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        o_ref[:] = out.reshape(group, seq, width).astype(o_ref.dtype)


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

    Geometry guard: the image group per grid step is chosen against a
    conservative scoped-VMEM estimate (G=2 fits ViT-B/16; larger geometries
    like ViT-L/14 drop to G=1). When even one image's FULL working set
    exceeds the budget, the kernel streams the hidden (mlp_dim) axis in
    chunks instead (``_int8_mlp_chunk_kernel`` — per-(row, chunk) activation
    quantization, c_proj partials accumulated in fp32 scratch; this is how
    ViT-L/14 keeps the int8 Pallas path). Only when no chunking fits does
    the same int8 math run as plain XLA ops (no VMEM ceiling).
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

    mode, group, n_chunks = _mlp_plan(bsz, seq, width, mlp_dim,
                                      x.dtype.itemsize)
    if mode == "chunked":
        chunk = mlp_dim // n_chunks
        rows = group * seq
        return pl.pallas_call(
            functools.partial(_int8_mlp_chunk_kernel, eps=eps,
                              n_chunks=n_chunks),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group, n_chunks),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, width), lambda b, c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, width), jnp.float32),  # residual/output acc
                pltpu.VMEM((rows, width), jnp.int8),     # quantized LN output
                pltpu.VMEM((rows, 1), jnp.float32),      # per-row LN scales
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * bsz * seq * width * mlp_dim,
                bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
                + 2 * width * mlp_dim,
                transcendentals=bsz * seq * mlp_dim,
            ),
            interpret=interpret,
        )(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2)
    if mode == "xla":
        out = _int8_mlp_rows(
            x.reshape(bsz * seq, width), ln_scale, ln_bias,
            w1_q, s1, b1, w2_q, s2, b2, eps,
        )
        return out.reshape(bsz, seq, width)

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
    wo_ref, bo_ref, mask_ref, o_ref,
    *, heads: int, dim: int, scale: float, eps: float,
):
    """Whole attention half-block with an int8 QKV projection, for a group
    of images per grid step: LN1 -> int8 QKV projection -> per-head attention
    (bf16 core, fp32 softmax) -> bf16 output projection -> residual.

    The QKV projection is ~67% of the half-block FLOPs (2·S·W·3W of
    2·S·W·4W + 4·H·S²·D per image) and runs int8×int8→int32 (measured ≈262
    TF/s-equivalent in-kernel — above bf16 peak). The OUTPUT projection
    stays bf16: it is the smallest matmul (W×W) and the (rows, W) row-quant
    pass it would need costs more than int8 saves there — measured −1.8 ms
    per 12-layer stack at B=256 AND one fewer quantization error
    (tools/kernel_experiments4.py, 'qobf16'). Activations for QKV are
    row-quantized dynamically (symmetric amax/127, same scheme as the int8
    MLP kernel); weights are per-output-channel.
    """
    width = heads * dim
    # natural-log-domain additive mask rescaled into the log2 domain once
    # (0/-inf are fixed points; see ops/attention.exp2_rows)
    mask = mask_ref[:] * jnp.float32(LOG2E)
    group, seq, _ = x_ref.shape
    # Both projections (~89% of half-block FLOPs) run ROW-MERGED across the
    # image group — per-slab matmuls pad 197 rows -> 224 sublane tiles each
    # (12% dead MACs), merged they pad once. Only the per-image softmax core
    # runs per slab (each image has its own mask/normalization).
    x = x_ref[:].reshape(group * seq, width)
    out = _int8_attn_group(
        x, ln_s_ref[:], ln_b_ref[:], wqkv_ref[:], sqkv_ref[:], bqkv_ref[:],
        wo_ref[:], bo_ref[:], mask,
        group=group, seq=seq, heads=heads, dim=dim, eps=eps, scale=scale,
    )
    o_ref[:] = out.reshape(group, seq, width)


def _attn_vmem_bytes(group: int, seq: int, width: int, itemsize: int) -> int:
    rows = group * seq
    return (
        2 * rows * width * itemsize       # x in + out blocks
        + 3 * width * width               # int8 wqkv
        + width * width * itemsize        # bf16 wo
        + rows * width * 4                # xf (live until the residual add)
        + rows * 3 * width * 4            # int32 QKV accumulator
        + rows * 3 * width * itemsize     # dequantized qkv
        + 2 * seq * seq * 4               # mask + one live score matrix
        + rows * width * 4                # attn concat (fp32)
    )


# HBM budget for the fallback's materialized (chunk, H, S, S) fp32
# probability tensor: geometries that reach the XLA fallback have large S
# (e.g. ViT-L/14@336's S=577), where an unchunked batch would allocate
# B*H*S^2*4 bytes (24.5 GB at B=1024) and OOM the 16 GB chip.
_FALLBACK_PROBS_BUDGET = 1 << 30


def _int8_attn_rows_xla(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo,
                        bo, mask, *, heads, dim, scale, eps):
    """The int8 attention half-block as plain XLA ops — the VMEM-overflow
    fallback for geometries whose working set exceeds the kernel budget.
    Same math as ``_int8_attn_kernel`` (row-quant + int8 QKV projection,
    log2-domain no-max softmax with the denominator folded past p@v, bf16
    output projection). Batches whose probability tensor exceeds
    _FALLBACK_PROBS_BUDGET run in lax.map chunks (identical numerics — the
    math is per-image)."""
    bsz, seq, width = x.shape
    per_img = heads * seq * seq * 4
    chunk = max(1, min(bsz, _FALLBACK_PROBS_BUDGET // per_img))
    while bsz % chunk:
        chunk -= 1
    if chunk < bsz:
        body = functools.partial(
            _int8_attn_rows_xla_body, ln_scale=ln_scale, ln_bias=ln_bias,
            wqkv_q=wqkv_q, sqkv=sqkv, bqkv=bqkv, wo=wo, bo=bo, mask=mask,
            heads=heads, dim=dim, scale=scale, eps=eps)
        out = jax.lax.map(body, x.reshape(bsz // chunk, chunk, seq, width))
        return out.reshape(bsz, seq, width)
    return _int8_attn_rows_xla_body(
        x, ln_scale=ln_scale, ln_bias=ln_bias, wqkv_q=wqkv_q, sqkv=sqkv,
        bqkv=bqkv, wo=wo, bo=bo, mask=mask, heads=heads, dim=dim,
        scale=scale, eps=eps)


def _int8_attn_rows_xla_body(x, *, ln_scale, ln_bias, wqkv_q, sqkv, bqkv,
                             wo, bo, mask, heads, dim, scale, eps):
    bsz, seq, width = x.shape
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)

    hq, hscale = _row_quant(h.reshape(bsz * seq, width))
    acc = jax.lax.dot_general(
        hq, wqkv_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * hscale * sqkv + bqkv.astype(jnp.float32))
    qkv = qkv.astype(x.dtype).reshape(bsz, seq, 3, heads, dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, D)

    q = q * jnp.asarray(scale * LOG2E, q.dtype)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    # natural-log-domain mask rescaled into the log2 domain (0/-inf fixed)
    p = exp2_rows(s + mask.astype(jnp.float32) * jnp.float32(LOG2E))
    denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    attn = (o * (1.0 / jnp.moveaxis(denom, 1, 2))).reshape(bsz * seq, width)

    out = jax.lax.dot_general(
        attn.astype(x.dtype), wo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out.astype(jnp.float32) + bo.astype(jnp.float32)
    return (xf + out.reshape(bsz, seq, width)).astype(x.dtype)


def _int8_attn_large_s(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo, bo,
                       mask, *, heads, eps, interpret):
    """Large-S overflow path that KEEPS the MXU kernels: when the
    half-block's whole working set exceeds the scoped-VMEM budget (e.g.
    ViT-L/14@336's S=577 — qkv alone is 7.1 MB fp32), the projections run
    as XLA int8 matmuls over (B*S, W) and only the attention CORE runs in
    Pallas — the same row-quant + log2-domain no-max softmax numerics as
    the fused kernel. Core selection: the all-heads packed core
    (``fused_attention_qkv``) when it fits VMEM; otherwise the HEAD-GROUPED
    core (``fused_attention_qkv_headgroups``) with the QKV weight columns
    permuted head-major at trace time (a free constant gather) so the
    projection emits the head-major layout the grouped kernel lane-blocks.
    Only if even one head's core cannot fit does the caller take the all-
    XLA chunked fallback (which materializes HBM probability tensors —
    measured 257 img/s at L/14@336 B=1024 vs this path's kernel-core
    number in PERF_NOTES)."""
    from aiic_tpu.ops.attention import (
        fused_attention_qkv,
        fused_attention_qkv_headgroups,
        headmajor_perm,
        pick_head_group,
        qkv_core_fits,
    )

    bsz, seq, width = x.shape
    dim = width // heads
    head_major = not qkv_core_fits(seq, width, x.dtype.itemsize)
    if head_major:
        perm = jnp.asarray(headmajor_perm(width, heads))
        wqkv_q = jnp.take(wqkv_q, perm, axis=1)
        sqkv = jnp.take(sqkv, perm, axis=-1)
        bqkv = jnp.take(bqkv, perm, axis=-1)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)

    hq, hscale = _row_quant(h.reshape(bsz * seq, width))
    acc = jax.lax.dot_general(
        hq, wqkv_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * hscale * sqkv + bqkv.astype(jnp.float32))
    qkv = qkv.astype(x.dtype).reshape(bsz, seq, 3 * width)

    if head_major:
        hg = pick_head_group(seq, heads, dim, x.dtype.itemsize)
        attn = fused_attention_qkv_headgroups(
            qkv, mask, heads=heads, head_group=hg, interpret=interpret)
    else:
        attn = fused_attention_qkv(qkv, mask, heads=heads, interpret=interpret)

    out = jax.lax.dot_general(
        attn.reshape(bsz * seq, width), wo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out.astype(jnp.float32) + bo.astype(jnp.float32)
    return (xf + out.reshape(bsz, seq, width)).astype(x.dtype)


def int8_ln_qkv_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv_q: jnp.ndarray,
    sqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    mask=None,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, W) -> (B, S, W): x + OutProj_bf16(Attn(QKV_int8(LN(x)))).

    Geometry guard: image group chosen against a scoped-VMEM estimate
    (G=2 at ViT-B/16; G=1 for larger towers); geometries that exceed the
    budget even at G=1 run the identical int8 math as plain XLA ops.
    """
    bsz, seq, width = x.shape
    dim = width // heads
    scale = dim ** -0.5

    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    sqkv = sqkv.reshape(1, 3 * width)
    bqkv = bqkv.reshape(1, 3 * width)
    bo = bo.reshape(1, width)
    wo = wo.astype(x.dtype)
    full_mask = jnp.zeros((seq, seq), jnp.float32) if mask is None else mask.astype(jnp.float32)

    # int8 weights free ~2.7 MB of VMEM vs the bf16 kernel; measured stack
    # fits at G=2 for ViT-B geometry (same grouping rule as the bf16 kernel).
    group = 2 if x.dtype.itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)
    while group > 1 and _attn_vmem_bytes(group, seq, width,
                                         x.dtype.itemsize) > _VMEM_BUDGET:
        group //= 2
    if _attn_vmem_bytes(group, seq, width, x.dtype.itemsize) > _VMEM_BUDGET:
        from aiic_tpu.ops.attention import pick_head_group

        # XLA int8 projections + Pallas attention core (all-heads when it
        # fits, else head-grouped with a head-major weight permutation —
        # ViT-L/14@336's all-heads core measures 17.93 MB > the 16 MB
        # scoped ceiling, its hg=8 grouped core ~10.5 MB). Only when even
        # one head's core cannot fit: the fully-XLA chunked fallback.
        if pick_head_group(seq, heads, dim, x.dtype.itemsize) is not None:
            return _int8_attn_large_s(
                x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo, bo,
                full_mask, heads=heads, eps=eps, interpret=interpret)
        return _int8_attn_rows_xla(
            x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo, bo,
            full_mask, heads=heads, dim=dim, scale=scale, eps=eps)

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
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width) + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize + 4 * width * width,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv_q, sqkv, bqkv, wo, bo, full_mask)
    return out


def _int8_attn_group(x, ln_s, ln_b, wqkv, sqkv, bqkv, wo, bo, mask,
                     *, group, seq, heads, dim, eps, scale):
    """The int8 attention half-block on a (G·S, W) VMEM slab — the exact
    math of ``_int8_attn_kernel`` factored out so the fused whole-block
    kernel shares it line for line (bit-identical numerics)."""
    width = heads * dim
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)

    hq, hscale = _row_quant(h)
    acc = jax.lax.dot_general(
        hq, wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,  # int8 MACs; see int8 MLP note
    )
    qkv = acc.astype(jnp.float32) * hscale * sqkv + bqkv.astype(jnp.float32)
    qkv = qkv.astype(x.dtype)  # (G*S, 3W)

    attns = []
    for g in range(group):
        tile = qkv[g * seq:(g + 1) * seq]
        outs = []
        for hd in range(heads):
            q = tile[:, hd * dim:(hd + 1) * dim]
            k = tile[:, width + hd * dim: width + (hd + 1) * dim]
            v = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            q = q * jnp.asarray(scale * LOG2E, q.dtype)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype),
            )
            p = exp2_rows(s + mask)
            denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=_mm_prec(v.dtype))
            outs.append(o * (1.0 / denom))
        attns.append(jnp.concatenate(outs, axis=-1))  # (S, W) fp32
    attn = jnp.concatenate(attns, axis=0)  # (G*S, W)

    out = jax.lax.dot_general(
        attn.astype(x.dtype), wo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_prec(x.dtype),
    )
    out = out + bo.astype(jnp.float32)
    return (xf + out).astype(x.dtype)


def _int8_block_kernel(
    x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    mask_ref, ln2s_ref, ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
    b2_ref, o_ref, *, heads: int, dim: int, scale: float, eps: float,
):
    """Whole transformer block (int8 attention half + int8 MLP half) in ONE
    program. vs the attn/MLP kernel pair this removes one full HBM
    round trip of the (B, S, W) activation per layer (the y1 intermediate
    never leaves VMEM) plus half the per-program launches. The attention
    output is cast to the block dtype before the MLP half — exactly what
    the kernel boundary did — so numerics are bit-identical to the pair."""
    width = heads * dim
    mask = mask_ref[:] * jnp.float32(LOG2E)
    group, seq, _ = x_ref.shape
    x = x_ref[:].reshape(group * seq, width)
    y1 = _int8_attn_group(
        x, ln1s_ref[:], ln1b_ref[:], wqkv_ref[:], sqkv_ref[:], bqkv_ref[:],
        wo_ref[:], bo_ref[:], mask,
        group=group, seq=seq, heads=heads, dim=dim, eps=eps, scale=scale,
    )
    out = _int8_mlp_rows(
        y1, ln2s_ref[:], ln2b_ref[:], w1_ref[:], s1_ref[:], b1_ref[:],
        w2_ref[:], s2_ref[:], b2_ref[:], eps,
    )
    o_ref[:] = out.reshape(group, seq, width)


def _block_vmem_bytes(group: int, seq: int, width: int, mlp_dim: int,
                      itemsize: int) -> int:
    """Peak-live VMEM for the fused block kernel: weights + in/out blocks
    stay resident for the whole program; the attention- and MLP-half
    temporaries are disjoint in time (Mosaic reuses the storage), so only
    the larger of the two stages counts."""
    rows = group * seq
    resident = (
        2 * rows * width * itemsize       # x in + out blocks
        + 3 * width * width               # int8 wqkv
        + width * width * itemsize        # bf16 wo
        + 2 * width * mlp_dim             # int8 MLP weight pair
        + rows * width * 4                # fp32 residual carrier (xf / y1f)
    )
    attn_stage = (
        rows * 3 * width * 4              # int32 QKV accumulator
        + rows * 3 * width * itemsize     # dequantized qkv
        + 2 * seq * seq * 4               # mask + one live score matrix
        + rows * width * 4                # attn concat (fp32)
    )
    mlp_stage = (
        rows * width * 4                  # LN2 output (fp32)
        + rows * mlp_dim * 4              # int32 accumulator / fp32 gelu slab
        + rows * mlp_dim                  # int8 quantized gelu output
    )
    return resident + max(attn_stage, mlp_stage)


def _block_chunk_vmem_bytes(group: int, seq: int, width: int, mlp_dim: int,
                            n_chunks: int, itemsize: int) -> int:
    """Peak-live VMEM for the hidden-axis-chunked fused block kernel: only
    one (W, M/C)+(M/C, W) MLP weight-chunk pair is resident per grid step
    (streamed; the attention weights keep constant block indices and stay);
    the fp32 residual accumulator and quantized LN2 output persist in
    scratch across the chunk loop. Peak is the c==0 step, which runs the
    whole attention half."""
    rows = group * seq
    chunk = mlp_dim // n_chunks
    resident = (
        2 * rows * width * itemsize       # x in + out blocks
        + 3 * width * width               # int8 wqkv
        + width * width * itemsize        # bf16 wo
        + 2 * width * chunk               # int8 MLP weight-chunk pair
        + rows * width * 4                # fp32 residual/output acc (scratch)
        + rows * width                    # hq int8 (scratch)
    )
    attn_stage = (
        rows * 3 * width * 4              # int32 QKV accumulator
        + rows * 3 * width * itemsize     # dequantized qkv
        + 2 * seq * seq * 4               # mask + one live score matrix
        + rows * width * 4                # attn concat fp32 / LN2 h transient
    )
    chunk_stage = (
        rows * chunk * 4                  # int32 accumulator / fp32 gelu slab
        + rows * chunk                    # int8 quantized gelu output
    )
    return resident + max(attn_stage, chunk_stage)


def _block_plan(bsz: int, seq: int, width: int, mlp_dim: int, itemsize: int):
    """Blocking decision for the fused whole-block kernel: full-weight
    blockings before chunked ones (MEASURED at ViT-B/16 B=512-1024:
    full-G1 5,588 > chunked-G2 5,395 img/s — the chunk-streamed weight
    re-fetch costs more than the G=2 row-merge recovers), larger image
    group first within each mode. Returns ("full", G, 1), ("chunked", G, C),
    or None when nothing fits."""
    for g in (2, 1):
        if bsz % g == 0 and _block_vmem_bytes(
                g, seq, width, mlp_dim, itemsize) <= _VMEM_BUDGET:
            return ("full", g, 1)
    for g in (2, 1):
        if bsz % g:
            continue
        c = 2
        while mlp_dim % c == 0 and mlp_dim // c >= 128:
            if _block_chunk_vmem_bytes(g, seq, width, mlp_dim, c,
                                       itemsize) <= _VMEM_BUDGET:
                return ("chunked", g, c)
            c *= 2
    return None


def _int8_block_chunk_kernel(
    x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    mask_ref, ln2s_ref, ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
    b2_ref, o_ref, acc_ref, hq_ref, hs_ref,
    *, heads: int, dim: int, scale: float, eps: float, n_chunks: int,
):
    """Whole transformer block with the MLP hidden axis chunked: grid
    (batch groups, chunks). Chunk 0 runs the full attention half (shared
    line-for-line with the attn kernel via ``_int8_attn_group``), casts its
    output to the block dtype (the kernel-pair boundary cast), then LN2 +
    row-quant into persistent scratch; every chunk step accumulates its
    c_proj partial into the fp32 scratch that already carries the attention
    output as the residual. Activation quantization for the second matmul
    is per (row, chunk) — the chunked-MLP kernel's numerics, mirrored by
    ``_int8_mlp_rows(n_chunks=C)``.

    This is how ViT-B/16 keeps the fused block at G=2: the full fused
    working set (~17.3 MB) exceeds VMEM, but streaming the MLP weight pair
    in C=4 chunks brings the c==0 peak to ~13.8 MB while keeping the G=2
    row-merge the full kernel had to give up (the measured reason fused
    lost to the pair at this geometry)."""
    width = heads * dim
    group, seq, _ = x_ref.shape
    rows = group * seq
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _first():
        mask = mask_ref[:] * jnp.float32(LOG2E)
        x = x_ref[:].reshape(rows, width)
        y1 = _int8_attn_group(
            x, ln1s_ref[:], ln1b_ref[:], wqkv_ref[:], sqkv_ref[:],
            bqkv_ref[:], wo_ref[:], bo_ref[:], mask,
            group=group, seq=seq, heads=heads, dim=dim, eps=eps, scale=scale,
        )  # block dtype — exactly the kernel-pair boundary cast
        y1f = y1.astype(jnp.float32)
        mean = jnp.mean(y1f, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y1f - mean), axis=-1, keepdims=True)
        h = (y1f - mean) * jax.lax.rsqrt(var + eps)
        h = h * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(jnp.float32)
        hq, hscale = _row_quant(h)
        hq_ref[:] = hq
        hs_ref[:] = hscale
        acc_ref[:] = y1f  # residual seeds the output accumulator

    acc = jax.lax.dot_general(
        hq_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    y = acc.astype(jnp.float32) * hs_ref[:] * s1_ref[:] + b1_ref[:].astype(jnp.float32)
    y = _gelu_exp2(y)
    yq, yscale = _row_quant(y)
    acc2 = jax.lax.dot_general(
        yq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc_ref[:] += acc2.astype(jnp.float32) * yscale * s2_ref[:]

    @pl.when(c == n_chunks - 1)
    def _last():
        out = acc_ref[:] + b2_ref[:].astype(jnp.float32)
        o_ref[:] = out.reshape(group, seq, width).astype(o_ref.dtype)


def int8_block(
    x: jnp.ndarray,
    ln1_scale: jnp.ndarray,
    ln1_bias: jnp.ndarray,
    wqkv_q: jnp.ndarray,
    sqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    mask,
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    w1_q: jnp.ndarray,
    s1: jnp.ndarray,
    b1: jnp.ndarray,
    w2_q: jnp.ndarray,
    s2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
    plan_override=None,
):
    """(B, S, W) -> (B, S, W): one whole int8 transformer block per program.

    Returns ``None`` when the geometry's working set exceeds the VMEM
    budget in every blocking (e.g. ViT-H/14-scale, whose resident
    attention weights alone crowd out the chunked form) — the caller falls
    back to the attn/MLP kernel pair, which blocks the two halves
    separately.

    Blocking is chosen by ``_block_plan``: the full weight-resident kernel
    at the largest image group that fits, else the hidden-axis-CHUNKED
    variant (``_int8_block_chunk_kernel``) that streams the MLP weight
    pair. Note EVERY fused blocking at ViT-B/16 is a measured loss vs the
    attn/MLP kernel pair (full-G1 5,588 / chunked-G2 5,395 vs 6,049 img/s
    — docs/PERF_NOTES.md), which is why models.clip auto-engages the fused
    kernel only on full-G>=2 plans (ViT-B/32: +3.4%).

    ``plan_override``: a ("full"|"chunked", G, C) tuple forcing a specific
    blocking (tests/microbenches only — must fit VMEM).
    """
    bsz, seq, width = x.shape
    dim = width // heads
    scale = dim ** -0.5
    mlp_dim = w1_q.shape[-1]

    plan = plan_override or _block_plan(bsz, seq, width, mlp_dim,
                                        x.dtype.itemsize)
    if plan is None:
        return None
    mode, group, n_chunks = plan

    ln1_scale = ln1_scale.reshape(1, width)
    ln1_bias = ln1_bias.reshape(1, width)
    sqkv = sqkv.reshape(1, 3 * width)
    bqkv = bqkv.reshape(1, 3 * width)
    bo = bo.reshape(1, width)
    wo = wo.astype(x.dtype)
    ln2_scale = ln2_scale.reshape(1, width)
    ln2_bias = ln2_bias.reshape(1, width)
    s1 = s1.reshape(1, mlp_dim)
    b1 = b1.reshape(1, mlp_dim)
    s2 = s2.reshape(1, width)
    b2 = b2.reshape(1, width)
    full_mask = (jnp.zeros((seq, seq), jnp.float32) if mask is None
                 else mask.astype(jnp.float32))

    if mode == "chunked":
        chunk = mlp_dim // n_chunks
        rows = group * seq
        fixed = lambda shape: pl.BlockSpec(
            shape, lambda b, c: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                _int8_block_chunk_kernel, heads=heads, dim=dim, scale=scale,
                eps=eps, n_chunks=n_chunks,
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group, n_chunks),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                fixed((1, width)), fixed((1, width)),
                fixed((width, 3 * width)), fixed((1, 3 * width)),
                fixed((1, 3 * width)),
                fixed((width, width)), fixed((1, width)),
                fixed((seq, seq)),
                fixed((1, width)), fixed((1, width)),
                pl.BlockSpec((width, chunk), lambda b, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda b, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda b, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, width), lambda b, c: (c, 0),
                             memory_space=pltpu.VMEM),
                fixed((1, width)), fixed((1, width)),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, width), jnp.float32),  # residual/output acc
                pltpu.VMEM((rows, width), jnp.int8),     # quantized LN2 output
                pltpu.VMEM((rows, 1), jnp.float32),      # per-row LN2 scales
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * seq * width * (4 * width + 2 * mlp_dim)
                + 4 * bsz * heads * seq * seq * dim,
                bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
                + 4 * width * width + 2 * width * mlp_dim,
                transcendentals=bsz * (heads * seq * seq + seq * mlp_dim),
            ),
            interpret=interpret,
        )(x, ln1_scale, ln1_bias, wqkv_q, sqkv, bqkv, wo, bo, full_mask,
          ln2_scale, ln2_bias, w1_q, s1, b1, w2_q, s2, b2)

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _int8_block_kernel, heads=heads, dim=dim, scale=scale, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full((1, width)), full((1, width)),
            full((width, 3 * width)), full((1, 3 * width)), full((1, 3 * width)),
            full((width, width)), full((1, width)),
            full((seq, seq)),
            full((1, width)), full((1, width)),
            full((width, mlp_dim)), full((1, mlp_dim)), full((1, mlp_dim)),
            full((mlp_dim, width)), full((1, width)), full((1, width)),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width + 2 * mlp_dim)
            + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
            + 4 * width * width + 2 * width * mlp_dim,
            transcendentals=bsz * (heads * seq * seq + seq * mlp_dim),
        ),
        interpret=interpret,
    )(x, ln1_scale, ln1_bias, wqkv_q, sqkv, bqkv, wo, bo, full_mask,
      ln2_scale, ln2_bias, w1_q, s1, b1, w2_q, s2, b2)


def quantize_attn_blocks(blocks: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize a tower's stacked QKV projection weights; returns
    {wqkv_q, sqkv} with the leading layer axis preserved. The output
    projection deliberately stays bf16 (see _int8_attn_kernel: the row-quant
    pass it needs costs more than int8 saves on the smallest matmul)."""
    def per_layer(w):
        qs = [quantize_weight(w[i]) for i in range(w.shape[0])]
        return (jnp.stack([q for q, _ in qs]), jnp.stack([s for _, s in qs]))

    wqkv_q, sqkv = per_layer(blocks["attn"]["wqkv"])
    return {"wqkv_q": wqkv_q, "sqkv": sqkv}


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
    """Full int8 serving quantization: MLP + attention projections, plus the
    int8 folded patch-embed for the patch-major uint8 wire (engages only on
    rank-3 uint8 inputs — the float/HWC paths keep the original weight)."""
    from aiic_tpu.ops.preprocess import quantize_patch_embed

    out = quantize_model_mlp(params, attn=True)
    visual = dict(out["visual"])
    visual["patch_embed_q"] = quantize_patch_embed(visual["patch_embed"])
    out["visual"] = visual
    return out
