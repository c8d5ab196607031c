"""Fused LN + MLP + residual Pallas kernel.

Covers the second half of a transformer block: ``x + W2·gelu(W1·LN(x))``.
XLA runs this as a matmul pair plus separate LN/gelu elementwise passes over
the (B·S, W) activations; fusing them keeps the normalized activations and
the gelu intermediate entirely in VMEM. Both weight matrices of a ViT-B
layer fit VMEM in bf16 (4.5 MB each), so they are grid-invariant blocks
loaded once while the kernel streams row tiles of the activation.

bf16-only (weights would not fit VMEM in fp32); callers fall back to the XLA
path for fp32 and for training (no VJP defined).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aiic_tpu.ops.attention import LOG2E, _mm_prec


def _mlp_kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps: float):
    x = x_ref[:]  # (rows, W)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32,
                precision=_mm_prec(h.dtype))
    h = h + b1_ref[:].astype(jnp.float32)
    # quick_gelu via exp2 (see ops/quant.py: Mosaic lowers exp2 faster than
    # its `logistic` path; numerically identical to the sigmoid form)
    h = h * (1.0 / (1.0 + jnp.exp2(jnp.float32(-1.702 * LOG2E) * h)))
    h = h.astype(x.dtype)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32,
                precision=_mm_prec(h.dtype))
    h = h + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (xf + h).astype(o_ref.dtype)


def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, W) -> (B, S, W): x + MLP(LN(x)), one fused kernel."""
    bsz, seq, width = x.shape
    mlp_dim = w1.shape[-1]
    n = bsz * seq
    xf = x.reshape(n, width)
    # weights must be in the compute dtype to fit VMEM (fp32 pair = 19 MB)
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)

    # Largest power-of-two divisor of n that is >=8 (TPU sublane rule);
    # if none exists (e.g. n=197 at batch 1), one block covering all rows.
    r = rows
    while r >= 8 and n % r != 0:
        r //= 2
    if r < 8:
        r = n

    # bias/scale vectors as (1, dim) for 2-D tiling
    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    b1 = b1.reshape(1, mlp_dim)
    b2 = b2.reshape(1, width)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mlp_dim, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * width * mlp_dim,
            bytes_accessed=2 * n * width * x.dtype.itemsize
            + 2 * width * mlp_dim * w1.dtype.itemsize,
            transcendentals=n * mlp_dim,
        ),
        interpret=interpret,
    )(xf, ln_scale, ln_bias, w1, b1, w2, b2)
    return out.reshape(bsz, seq, width)


def resolve_mlp_impl(impl: str, dtype, training: bool = False) -> str:
    """'auto' -> fused kernel only on TPU, bf16, inference."""
    if impl != "auto":
        return impl
    if training or dtype != jnp.bfloat16:
        return "xla"
    return "pallas" if jax.default_backend() == "tpu" else "xla"
