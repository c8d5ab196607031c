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


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) fp weight -> (int8 weight, fp32 per-output-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _row_quant(h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (rows, d) -> (int8, fp32 per-row scale (rows, 1))."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_mlp_kernel(
    x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, *, eps: float,
):
    x = x_ref[:]  # (rows, W)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)

    hq, hscale = _row_quant(h)
    acc = jax.lax.dot_general(
        hq, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * hscale * s1_ref[:] + b1_ref[:].astype(jnp.float32)
    y = y * jax.nn.sigmoid(1.702 * y)  # quick_gelu, fp32

    yq, yscale = _row_quant(y)
    acc2 = jax.lax.dot_general(
        yq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc2.astype(jnp.float32) * yscale * s2_ref[:] + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + out).astype(o_ref.dtype)


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
    """(B, S, W) -> (B, S, W): x + int8-MLP(LN(x))."""
    bsz, seq, width = x.shape
    mlp_dim = w1_q.shape[-1]
    n = bsz * seq
    xf = x.reshape(n, width)

    # Largest power-of-two divisor of n that is >=8 (TPU sublane rule);
    # if none exists (e.g. n=197 at batch 1), one block covering all rows.
    r = rows
    while r >= 8 and n % r != 0:
        r //= 2
    if r < 8:
        r = n

    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    s1 = s1.reshape(1, mlp_dim)
    b1 = b1.reshape(1, mlp_dim)
    s2 = s2.reshape(1, width)
    b2 = b2.reshape(1, width)

    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mlp_dim, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * width * mlp_dim,
            bytes_accessed=2 * n * width * x.dtype.itemsize + 2 * width * mlp_dim,
            transcendentals=n * mlp_dim,
        ),
        interpret=interpret,
    )(xf, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2)
    return out.reshape(bsz, seq, width)


def quantize_mlp_blocks(blocks: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize a tower's stacked MLP weights; returns
    {w1_q, s1, w2_q, s2} with the leading layer axis preserved."""
    def per_layer(w):
        qs = [quantize_weight(w[i]) for i in range(w.shape[0])]
        return (jnp.stack([q for q, _ in qs]), jnp.stack([s for _, s in qs]))

    w1_q, s1 = per_layer(blocks["mlp"]["w1"])
    w2_q, s2 = per_layer(blocks["mlp"]["w2"])
    return {"w1_q": w1_q, "s1": s1, "w2_q": w2_q, "s2": s2}


def quantize_model_mlp(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a params tree with int8-quantized MLP weights attached as
    ``blocks['mlp_q']`` for both towers. ``models.clip.block`` picks the int8
    kernel up automatically on the bf16 inference path (quantize AFTER any
    LoRA folding so adapters are included in the quantized weights)."""
    out = dict(params)
    for tower in ("visual", "text"):
        t = dict(out[tower])
        blocks = dict(t["blocks"])
        blocks["mlp_q"] = quantize_mlp_blocks(blocks)
        t["blocks"] = blocks
        out[tower] = t
    return out
