"""Pallas TPU attention kernel.

The towers run short fixed sequences (197 visual / 77 text tokens —
SURVEY.md §5g), so the optimal TPU shape is not a streaming flash kernel but
a **single-pass fused kernel per (batch, head)**: Q/K/V tiles live entirely
in VMEM, the (S, S) score matrix never touches HBM, and softmax statistics
stay in registers. This removes the score-matrix HBM round-trip XLA's
unfused attention pays (B·H·S² values per layer) while keeping the MXU fed.

Layout decisions:
- sequences are zero-padded up to a multiple of 128 (lane width); padded keys
  are masked to -inf before softmax; padded queries produce garbage rows that
  the caller slices off;
- head_dim 64 is zero-padded to 128 — trailing-dim tiles must be 128 wide;
  the pad contributes nothing to q·k or p·v (zero columns);
- one grid step per (batch·head): for ViT-B/16 at batch 256 that is 3072
  independent programs of (256, 128) tiles — ample parallelism;
- float32 softmax and accumulation (``preferred_element_type``) regardless of
  input dtype.

Falls back to the plain XLA einsum path off-TPU; tests run the kernel in
interpreter mode for bit-level comparison.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_prec(dt):
    """Matmul precision for in-kernel dots: non-fp32 operands must NOT
    inherit a caller's default_matmul_precision("highest") context — Mosaic
    cannot multi-pass bf16/int8 operands ("Bad lhs type"). fp32 operands keep
    the context so fp32 parity runs get exact multi-pass matmuls."""
    import jax.numpy as _jnp

    return None if dt == _jnp.float32 else jax.lax.Precision.DEFAULT


# Clamped no-max softmax in the log2 domain (see exp2_rows): e^70 numerators
# keep the *unnormalized* fp32 p@v accumulation safely bounded
# (197 · e^70 · |v| ≈ 1e33 ≪ 3.4e38 fp32 max).
LOG2E = 1.4426950408889634

# Group-selection budget for the packed-qkv attention core, calibrated
# against Mosaic's measured stack: ViT-L/14@336 (S=577, W=1024) reports
# 17.93 MB actual at G=1 vs 17.0 MB from this estimator; ViT-B/16 G=2 is
# ~6.2 MB estimated vs ~9.3 MB measured-with-overheads — both on the right
# side of the budget.
_CORE_VMEM_BUDGET = 14 * 1024 * 1024


def qkv_core_vmem_bytes(group: int, seq: int, width: int, itemsize: int) -> int:
    """Scoped-VMEM estimate for one fused_attention_qkv program: double-
    buffered qkv-in + out slabs, fp32 mask + two live (S, S) probability
    tiles, and the per-head output accumulation/concat scratch."""
    return (2 * group * seq * 4 * width * itemsize   # dbuf (S,3W) in + (S,W) out
            + 3 * seq * seq * 4                       # mask + 2 live prob tiles
            + 3 * group * seq * width * itemsize)     # concat/epilogue scratch


def qkv_core_fits(seq: int, width: int, itemsize: int, group: int = 1) -> bool:
    """Whether the packed-qkv core compiles at the given group — callers
    with VMEM-overflow fallbacks must check this before selecting the
    kernel (ViT-L/14@336's S=577/W=1024 does NOT fit even at G=1)."""
    return qkv_core_vmem_bytes(group, seq, width, itemsize) <= _CORE_VMEM_BUDGET


def ln_attn_vmem_bytes(group: int, seq: int, width: int, itemsize: int) -> int:
    """Peak-live estimate for one ``fused_ln_qkv_attention`` program — the
    int8 half-block estimator's terms (ops.quant._attn_vmem_bytes) with the
    QKV weight at the compute dtype instead of int8. Calibrated the same
    way: ViT-B/16 bf16 G=2 lands at 13.5 MiB (fits — the shipped config),
    ViT-L/14 bf16 G=1 at 16.0 MiB and ViT-L/14@336 at 27.5 MiB (both
    overflow the 16 MB scoped ceiling and take the large-S composition)."""
    rows = group * seq
    return (
        2 * rows * width * itemsize       # x in + out blocks
        + 3 * width * width * itemsize    # wqkv (compute dtype)
        + width * width * itemsize        # wo
        + rows * width * 4                # xf (live until the residual add)
        + rows * 3 * width * 4            # fp32 QKV projection output
        + rows * 3 * width * itemsize     # cast qkv
        + 2 * seq * seq * 4               # mask + one live score matrix
        + rows * width * 4                # attn concat (fp32)
    )
_EXP2_CLAMP = 70.0 * LOG2E


def exp2_rows(s: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized softmax numerators WITHOUT the max-subtraction pass,
    for scores already scaled into the log2 domain (fold ``scale·log2(e)``
    into Q before the QK^T matmul — (S, D) elements instead of (S, S)).

    The canonical stable softmax spends an (S, S) max-reduction plus a full
    subtract traversal purely to guard exp against overflow; clamping gives
    the same guarantee in one fused elementwise op. exp2(min(s, C)) yields a
    softmax *identical in exact arithmetic* to the stable form whenever the
    row max is <= C — always true for LN-bounded ViT/text activations
    (|scores| ≲ 30 observed) — and degrades gracefully (uniform over clamped
    entries, no overflow) on adversarial scores. Additive masks pass through
    unharmed: 0 and -inf are fixed points of the log2 rescale and the clamp.

    Callers divide ONCE after the p@v matmul — an (S, D) scale by 1/rowsum
    instead of an (S, S) divide (flash-attention's denominator fold).
    Measured together: -3.9 ms on the 12-layer int8 attention stack at
    B=256 on v5e vs the stable-softmax base; 12-layer compounded cosine
    0.999994.
    """
    return jnp.exp2(jnp.minimum(s, _EXP2_CLAMP))


def _denom_guard(denom: jnp.ndarray) -> jnp.ndarray:
    """Keep the folded softmax denominator away from exact zero: a row whose
    scores ALL underflow exp2 (possible only for adversarial inputs ~-104 in
    natural-log units — LN-bounded activations never get there) would
    otherwise produce 0/0 = NaN; with the floor it degrades to an all-zero
    attention row instead (0 · 1e38 = 0), matching the no-max design's
    graceful-degradation contract."""
    return jnp.maximum(denom, jnp.float32(1e-38))


def _ln_qkv_attention_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref,
    o_ref, *, heads: int, dim: int, scale: float, eps: float,
):
    """Whole attention half-block for one image: LN1 -> QKV projection ->
    per-head attention -> output projection -> residual. All weights stay
    VMEM-resident; the QKV activation, scores, and head outputs never touch
    HBM."""
    width = heads * dim
    # additive masks carry NATURAL-log semantics (the public contract);
    # scores are in the log2 domain, so rescale once. 0/-inf are fixed points.
    mask = mask_ref[:] * jnp.float32(LOG2E)
    group = x_ref.shape[0]
    for g in range(group):
        x = x_ref[g]  # (S, W)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
        h = h.astype(x.dtype)

        qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32,
                      precision=_mm_prec(h.dtype))
        qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (S, 3W)

        outs = []
        for hd in range(heads):
            q = qkv[:, hd * dim:(hd + 1) * dim]
            k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
            v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            q = q * jnp.asarray(scale * LOG2E, q.dtype)  # log2-domain scores
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype),
            )
            p = exp2_rows(s + mask)
            denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=_mm_prec(v.dtype))
            outs.append((o * (1.0 / denom)).astype(x.dtype))
        attn = jnp.concatenate(outs, axis=-1)  # (S, W)

        out = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32,
                      precision=_mm_prec(attn.dtype))
        out = out + bo_ref[:].astype(jnp.float32)
        o_ref[g] = (xf + out).astype(o_ref.dtype)


def fused_ln_qkv_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, W) -> (B, S, W): x + OutProj(Attention(QKV(LN(x))))."""
    bsz, seq, width = x.shape
    dim = width // heads
    scale = dim ** -0.5

    # weights in compute dtype so they fit VMEM (wqkv bf16 = 3.5 MB for ViT-B)
    wqkv = wqkv.astype(x.dtype)
    wo = wo.astype(x.dtype)
    ln_scale = ln_scale.reshape(1, width)
    ln_bias = ln_bias.reshape(1, width)
    bqkv = bqkv.reshape(1, 3 * width)
    bo = bo.reshape(1, width)
    full_mask = jnp.zeros((seq, seq), jnp.float32) if mask is None else mask.astype(jnp.float32)

    # group images per grid step when VMEM allows (bf16 only reaches here)
    group = 2 if x.dtype.itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)
    while group > 1 and ln_attn_vmem_bytes(group, seq, width,
                                           x.dtype.itemsize) > _CORE_VMEM_BUDGET:
        group //= 2
    if ln_attn_vmem_bytes(group, seq, width, x.dtype.itemsize) > _CORE_VMEM_BUDGET:
        # The whole half-block does not fit scoped VMEM even one image at a
        # time (ViT-L/14 geometries): same fallback ladder as the int8 path.
        return _ln_qkv_attention_large_s(
            x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, full_mask,
            heads=heads, eps=eps, interpret=interpret)

    out = pl.pallas_call(
        functools.partial(
            _ln_qkv_attention_kernel, heads=heads, dim=dim, scale=scale, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width) + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
            + 4 * width * width * x.dtype.itemsize,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, full_mask)
    return out


def _ln_qkv_attention_large_s(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo,
                              full_mask, *, heads, eps, interpret):
    """bf16/fp32 mirror of ops.quant._int8_attn_large_s: XLA LN + QKV
    matmul, Pallas attention core (all-heads packed when it fits, else
    head-grouped with the QKV weight columns permuted head-major at trace
    time — a free constant gather), XLA out projection + residual.
    Geometries where even one head's core cannot fit run the identical math
    batch-chunked in XLA (bounded probability tensors). Keeps the
    non-quantized pallas path compiling at ViT-L/14 geometries, where the
    fused half-block kernel's working set (16-28 MB) exceeds scoped VMEM."""
    bsz, seq, width = x.shape
    dim = width // heads

    hg = None
    head_major = not qkv_core_fits(seq, width, x.dtype.itemsize)
    if head_major:
        hg = pick_head_group(seq, heads, dim, x.dtype.itemsize)
        if hg is not None:
            perm = jnp.asarray(headmajor_perm(width, heads))
            wqkv = jnp.take(wqkv, perm, axis=1)
            bqkv = jnp.take(bqkv, perm, axis=-1)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = h.astype(x.dtype)

    qkv = jnp.dot(h.reshape(bsz * seq, width), wqkv,
                  preferred_element_type=jnp.float32,
                  precision=_mm_prec(h.dtype))
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(bsz, seq, 3 * width)

    if not head_major:
        attn = fused_attention_qkv(qkv, full_mask, heads=heads,
                                   interpret=interpret)
    elif hg is not None:
        attn = fused_attention_qkv_headgroups(
            qkv, full_mask, heads=heads, head_group=hg, interpret=interpret)
    else:
        attn = _attention_qkv_xla_chunked(qkv, full_mask, heads)

    out = jnp.dot(attn.reshape(bsz * seq, width), wo,
                  preferred_element_type=jnp.float32,
                  precision=_mm_prec(x.dtype))
    out = out.astype(jnp.float32) + bo.astype(jnp.float32)
    return (xf + out.reshape(bsz, seq, width)).astype(x.dtype)


def resolve_attn_impl(impl: str) -> str:
    """'auto' -> 'pallas' on TPU (measured 40%+ faster end-to-end than the
    XLA einsum path on v5e), 'xla' elsewhere."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """Fused attention over a block of G (batch·head) pairs.

    Blocking G pairs per grid step amortizes per-program overhead — with one
    pair per step the per-step work is ~30 µs of matmul, far below grid
    dispatch cost; at G=8-16 the MXU stays busy.
    """
    q = q_ref[:]  # (G, Sp, Dp)
    k = k_ref[:]
    v = v_ref[:]
    q = q * jnp.asarray(scale * LOG2E, q.dtype)  # log2-domain scores
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # batched q @ k.T
        preferred_element_type=jnp.float32,
        precision=_mm_prec(q.dtype),
    )
    # natural-log-domain mask rescaled into the log2 domain (0/-inf fixed)
    p = exp2_rows(s + (mask_ref[:] * jnp.float32(LOG2E))[None])
    denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # batched p @ v
        preferred_element_type=jnp.float32,
        precision=_mm_prec(v.dtype),
    )
    o_ref[:] = (o * (1.0 / denom)).astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    block_pairs: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, H, D) q/k/v -> (B, S, H, D), additive float mask (S, S) or None."""
    bsz, seq, heads, dim = q.shape
    sp = _round_up(seq, 128)
    dp = _round_up(dim, 128)
    scale = dim ** -0.5

    n_pairs = bsz * heads
    g = block_pairs
    while n_pairs % g != 0:  # grid must tile the pair axis exactly
        g //= 2
    g = max(g, 1)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(n_pairs, seq, dim)
        return jnp.pad(x, ((0, 0), (0, sp - seq), (0, dp - dim)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    # Additive mask covering padded keys (and the caller's causal mask).
    full_mask = jnp.zeros((sp, sp), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:seq, :seq].set(mask.astype(jnp.float32))
    if sp > seq:
        full_mask = full_mask.at[:, seq:].set(-jnp.inf)

    grid = (n_pairs // g,)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n_pairs, sp, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, sp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, sp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pairs * sp * sp * dp,
            bytes_accessed=4 * n_pairs * sp * dp * q.dtype.itemsize,
            transcendentals=n_pairs * sp * sp,
        ),
        interpret=interpret,
    )(qf, kf, vf, full_mask)

    out = out[:, :seq, :dim].reshape(bsz, heads, seq, dim)
    return jnp.transpose(out, (0, 2, 1, 3))


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, interpreter elsewhere (tests), so
    ``attn_impl='pallas'`` is valid on every backend."""
    on_tpu = jax.default_backend() == "tpu"
    return fused_attention(q, k, v, mask, interpret=not on_tpu)


# ---------------------------------------------------------------------------
# Transpose-free variant
# ---------------------------------------------------------------------------
#
# Measured on v5e (ViT-B/16, B=256): the (B,S,H,D)<->(B,H,S,D) transposes
# around attention cost ~5 ms/layer — MORE than the attention math. TPU
# transposes on minor dims are VPU lane shuffles at ~10% of HBM bandwidth.
# This kernel eliminates them: it consumes the QKV projection's natural
# output layout (B, S, 3, H, D) directly (the reshape from (B, S, 3W) is
# free), head-slices inside VMEM, and writes (B, S, H, D) so the caller's
# reshape to (B, S, W) is free too. One grid step per image processes all
# heads, keeping per-program work large enough to amortize grid overhead.


def _attention_qkv_kernel(qkv_ref, mask_ref, o_ref, *, heads: int, dim: int,
                          scale: float, group: int):
    """Processes ``group`` images × all heads per grid step.

    The qkv block is the projection's raw (S, 3·H·D) activation — taking it
    unreshaped keeps the custom call's operand layout identical to the
    producing matmul's output layout, which removes the ~12 GB/s-effective
    relayout copies XLA otherwise inserts (measured 24 ms/step at B=256).
    Head slices are static 64-lane column windows; Mosaic handles the
    sub-128 lane offsets with in-VMEM shifts, far cheaper than HBM copies.
    """
    # natural-log-domain mask rescaled into the log2 domain (0/-inf fixed)
    mask = mask_ref[:] * jnp.float32(LOG2E)
    width = heads * dim
    for g in range(group):
        tile = qkv_ref[g]  # (S, 3*H*D) columns ordered [Q | K | V]
        outs = []
        for h in range(heads):  # static unroll: distinct small matmuls per head
            q = tile[:, h * dim:(h + 1) * dim]  # (S, D)
            k = tile[:, width + h * dim: width + (h + 1) * dim]
            v = tile[:, 2 * width + h * dim: 2 * width + (h + 1) * dim]
            q = q * jnp.asarray(scale * LOG2E, q.dtype)  # log2-domain scores
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype),
            )
            p = exp2_rows(s + mask)
            denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=_mm_prec(v.dtype))
            outs.append((o * (1.0 / denom)).astype(o_ref.dtype))
        # One lane-aligned (S, H*D) store — exactly the layout the
        # out-projection consumes, so no reshape survives outside.
        o_ref[g] = jnp.concatenate(outs, axis=-1)


def fused_attention_qkv(
    qkv: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    heads: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-QKV activations -> (B, S, H*D) attention output, with no layout
    transposes or relayout copies on either side.

    Accepts either (B, S, 3, H, D) or the projection's raw (B, S, 3*H*D)
    (pass ``heads``); the 5-D form is flattened — the kernel always sees the
    raw 2-D tile so the custom call's operand layout matches the producing
    matmul's output layout (no relayout copies).
    """
    if qkv.ndim == 5:
        bsz, seq, three, heads, dim = qkv.shape
        assert three == 3
        qkv = qkv.reshape(bsz, seq, 3 * heads * dim)
    else:
        assert heads is not None, "heads= required for 3-D qkv"
        bsz, seq, _ = qkv.shape
        dim = (qkv.shape[-1] // 3) // heads
    scale = dim ** -0.5

    # Scoped-VMEM budget (16MB): measured stack usage for ViT-B geometry is
    # ~9.3M at bf16/G=2 and ~20.8M at fp32/G=2 — so two images per program in
    # bf16, one in fp32. (G=4 bf16 OOMs at 18.5M.) Larger geometries
    # (ViT-L/14@336: S=577, W=1024) reduce the group until the estimate
    # fits — double-buffered in/out slabs plus mask and two live per-head
    # (S, S) fp32 probability tiles.
    group = 2 if qkv.dtype.itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)
    while group > 1 and not qkv_core_fits(seq, heads * dim,
                                          qkv.dtype.itemsize, group):
        group //= 2
    if not qkv_core_fits(seq, heads * dim, qkv.dtype.itemsize, group):
        # Even one image overflows scoped VMEM (ViT-L/14@336's all-heads
        # tile is 17.93 MB). The packed [Q|K|V] columns cannot lane-block a
        # head group without a runtime gather, so overflow geometries run
        # the batch-chunked XLA core; callers that control the QKV weights
        # (the large-S half-block paths) permute them head-major and use
        # fused_attention_qkv_headgroups instead.
        return _attention_qkv_xla_chunked(qkv, mask, heads)

    full_mask = jnp.zeros((seq, seq), jnp.float32) if mask is None else mask.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _attention_qkv_kernel, heads=heads, dim=dim, scale=scale, group=group
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, heads * dim), qkv.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, 3 * heads * dim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, heads * dim), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * heads * dim * qkv.dtype.itemsize,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(qkv, full_mask)
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper (training text tower)
# ---------------------------------------------------------------------------


def headmajor_perm(width: int, heads: int) -> "np.ndarray":
    """Column permutation turning the packed [Q | K | V] QKV layout into
    HEAD-MAJOR [q_h0 | k_h0 | v_h0 | q_h1 | ...] (3*dim per head).

    Applied to the QKV *weight* columns (plus its scales/bias) at trace
    time — a constant gather on an (W, 3W) tensor, free at runtime — so the
    projection matmul emits head-major activations directly. Head-major
    layout makes a HEAD GROUP a contiguous lane window, which lets
    ``fused_attention_qkv_headgroups`` grid over (image, head-group) and
    fit large-S geometries (ViT-L/14@336: S=577) in scoped VMEM where the
    all-heads tile cannot."""
    import numpy as np

    d = width // heads
    idx = []
    for h in range(heads):
        idx.extend(range(h * d, (h + 1) * d))
        idx.extend(range(width + h * d, width + (h + 1) * d))
        idx.extend(range(2 * width + h * d, 2 * width + (h + 1) * d))
    return np.asarray(idx, np.int32)


def _attention_qkv_hg_kernel(qkv_ref, mask_ref, o_ref, *, head_group: int,
                             dim: int, scale: float, group: int):
    """Head-grouped variant of ``_attention_qkv_kernel``: the tile is a
    HEAD-MAJOR (S, head_group*3*dim) lane window; outputs the standard
    head-concat (S, head_group*dim) slice."""
    mask = mask_ref[:] * jnp.float32(LOG2E)
    for g in range(group):
        tile = qkv_ref[g]
        outs = []
        for j in range(head_group):
            base = j * 3 * dim
            q = tile[:, base:base + dim]
            k = tile[:, base + dim:base + 2 * dim]
            v = tile[:, base + 2 * dim:base + 3 * dim]
            q = q * jnp.asarray(scale * LOG2E, q.dtype)
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype),
            )
            p = exp2_rows(s + mask)
            denom = _denom_guard(jnp.sum(p, axis=-1, keepdims=True))
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                        precision=_mm_prec(v.dtype))
            outs.append((o * (1.0 / denom)).astype(o_ref.dtype))
        o_ref[g] = jnp.concatenate(outs, axis=-1)


def pick_head_group(seq: int, heads: int, dim: int, itemsize: int):
    """Largest head group whose per-program working set fits the core VMEM
    budget (None if even one head does not fit)."""
    hg = heads
    while hg >= 1:
        if heads % hg == 0 and qkv_core_vmem_bytes(1, seq, hg * dim, itemsize) <= _CORE_VMEM_BUDGET:
            return hg
        hg //= 2
    return None


def fused_attention_qkv_headgroups(
    qkv_hm: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    heads: int,
    head_group: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """HEAD-MAJOR packed qkv (B, S, 3*H*D) -> (B, S, H*D) attention output.

    Input columns are ordered per-head [q_h | k_h | v_h] (see
    ``headmajor_perm`` — produced for free by permuting the QKV weight
    columns); output is the standard head-concat the out-projection
    consumes. Grid is (images, head-groups): each program sees only
    ``head_group`` heads' lanes, so geometries whose all-heads tile
    overflows scoped VMEM (ViT-L/14@336's S=577: 17.93 MB) fit — at hg=8
    the estimate is ~10.5 MB."""
    bsz, seq, three_w = qkv_hm.shape
    dim = (three_w // 3) // heads
    scale = dim ** -0.5
    assert heads % head_group == 0

    full_mask = jnp.zeros((seq, seq), jnp.float32) if mask is None else mask.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _attention_qkv_hg_kernel, head_group=head_group, dim=dim,
            scale=scale, group=1,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, heads * dim), qkv_hm.dtype),
        grid=(bsz, heads // head_group),
        in_specs=[
            pl.BlockSpec((1, seq, head_group * 3 * dim), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seq, head_group * dim), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * heads * dim * qkv_hm.dtype.itemsize,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(qkv_hm, full_mask)
    return out


# HBM budget for the chunked XLA core's materialized (chunk, H, S, S) fp32
# probability tensor (mirrors ops.quant._FALLBACK_PROBS_BUDGET): an
# unchunked ViT-L/14@336 batch of 1024 would allocate 24.5 GB and OOM.
_FALLBACK_PROBS_BUDGET = 1 << 30


def _attention_qkv_xla_chunked(qkv: jnp.ndarray, mask: Optional[jnp.ndarray],
                               heads: int) -> jnp.ndarray:
    """Batch-chunked :func:`_attention_qkv_xla` for geometries where no
    Pallas core fits scoped VMEM: identical per-image math, with the batch
    run in lax.map chunks sized so the fp32 probability tensor stays under
    _FALLBACK_PROBS_BUDGET."""
    bsz, seq, w3 = qkv.shape
    per_img = heads * seq * seq * 4
    chunk = max(1, min(bsz, _FALLBACK_PROBS_BUDGET // per_img))
    while bsz % chunk:
        chunk -= 1
    if chunk == bsz:
        return _attention_qkv_xla(qkv, mask, heads)
    out = jax.lax.map(
        lambda q: _attention_qkv_xla(q, mask, heads),
        qkv.reshape(bsz // chunk, chunk, seq, w3),
    )
    return out.reshape(bsz, seq, w3 // 3)


def _attention_qkv_xla(qkv: jnp.ndarray, mask: Optional[jnp.ndarray],
                       heads: int) -> jnp.ndarray:
    """THE XLA composition of the attention core: the reference softmax-
    attention math on a fused (B, S, 3W) QKV activation. Single source of
    truth — ``models.clip.attention``'s xla branch runs inference through
    it, and :func:`fused_attention_qkv_vjp` differentiates it for the
    backward pass, so the two can never diverge."""
    bsz, seq, w3 = qkv.shape
    width = w3 // 3
    dim = width // heads
    q = qkv[..., :width].reshape(bsz, seq, heads, dim)
    k = qkv[..., width:2 * width].reshape(bsz, seq, heads, dim)
    v = qkv[..., 2 * width:].reshape(bsz, seq, heads, dim)
    scale = dim ** -0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(qkv.dtype).reshape(bsz, seq, width)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_attention_qkv_vjp(qkv: jnp.ndarray, mask: jnp.ndarray, heads: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Differentiable transpose-free attention: Pallas kernel forward, XLA
    backward.

    The core has no parameters (LoRA attaches to c_fc/c_proj/out_proj, never
    the QKV weights), so the only cotangent needed is w.r.t. the fused QKV
    activations; the backward recomputes the small XLA composition at the
    saved (qkv, mask) and differentiates it — the standard
    recompute-the-forward trade, with the fast kernel keeping its transpose-
    free layout on the forward path. ``mask`` must be a concrete (S, S) array
    (pass zeros for no mask); its cotangent is zero (masks are never
    trained).

    Numerics caveat: the kernel forward uses the clamped no-max exp2 softmax
    (exp2_rows) while the backward differentiates the unclamped
    ``jax.nn.softmax`` composition. For rows whose max score exceeds the
    70-nat clamp (degraded to uniform-over-clamped in the forward) or fully
    underflowed rows, the backward therefore differentiates a slightly
    different function than the forward evaluated. LN-bounded activations
    never reach that regime (scores ≤ ~|q||k|·scale ≪ 70 nats after
    pre-LN); acceptable by design, but do not feed this path un-normalized
    scores."""
    return fused_attention_qkv(qkv, mask, heads=heads, interpret=interpret)


def _attention_qkv_bwd_kernel(qkv_ref, mask_ref, g_ref, dqkv_ref,
                              *, heads: int, dim: int, scale: float):
    """Hand-written attention-core backward for a group of images: given the
    fused QKV activations and the output cotangent, emit the QKV cotangent
    in the same transpose-free (rows, 3W) layout.

    Per head (all in VMEM, fp32 accumulation):
        p  = softmax(scale·q kᵀ + mask)        (recomputed — nothing stashed;
                                                same clamped exp2 numerators
                                                as the forward kernel)
        dv = pᵀ g
        dp = g vᵀ
        ds = p ∘ (dp − rowsum(dp ∘ p))          (softmax cotangent)
        dq = scale · ds k,   dk = scale · dsᵀ q
    """
    width = heads * dim
    # natural-log-domain mask rescaled into the log2 domain (0/-inf fixed)
    mask = mask_ref[:] * jnp.float32(LOG2E)
    group, seq, _ = qkv_ref.shape
    qkv = qkv_ref[:].reshape(group * seq, 3 * width)
    gout = g_ref[:].reshape(group * seq, width)

    rows = []
    for gi in range(group):
        tile = qkv[gi * seq:(gi + 1) * seq]
        gtile = gout[gi * seq:(gi + 1) * seq]
        dqs, dks, dvs = [], [], []
        for hd in range(heads):
            q = tile[:, hd * dim:(hd + 1) * dim]
            k = tile[:, width + hd * dim: width + (hd + 1) * dim]
            v = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            gh = gtile[:, hd * dim:(hd + 1) * dim].astype(jnp.float32)

            qs = q * jnp.asarray(scale * LOG2E, q.dtype)
            s = jax.lax.dot_general(
                qs, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype))
            p = exp2_rows(s + mask)
            p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))

            pb = p.astype(v.dtype)
            dv = jax.lax.dot_general(  # pᵀ g: contract over query rows
                pb, gh.astype(v.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(v.dtype))
            dp = jax.lax.dot_general(  # g vᵀ
                gh.astype(v.dtype), v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(v.dtype))
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(q.dtype)
            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype))
            dk = jax.lax.dot_general(  # dsᵀ q: contract over query rows
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_prec(q.dtype))
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        # one lane-aligned (S, 3W) store in the fused-QKV column layout
        rows.append(jnp.concatenate(
            [jnp.concatenate(dqs, axis=-1),
             jnp.concatenate(dks, axis=-1),
             jnp.concatenate(dvs, axis=-1)], axis=-1))
    dqkv_ref[:] = jnp.concatenate(rows, axis=0).astype(
        dqkv_ref.dtype).reshape(group, seq, 3 * width)


def fused_attention_qkv_bwd(qkv: jnp.ndarray, mask: jnp.ndarray,
                            g: jnp.ndarray, *, heads: int,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, S, 3W) qkv + (B, S, W) output cotangent -> (B, S, 3W) cotangent."""
    bsz, seq, w3 = qkv.shape
    width = w3 // 3
    dim = width // heads
    scale = dim ** -0.5

    # Three live (S, S) fp32 matrices per head plus the (rows, 3W) operands;
    # G=2 measured to fit ViT/text geometry comfortably (~9 MB).
    group = 2 if qkv.dtype.itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)

    return pl.pallas_call(
        functools.partial(_attention_qkv_bwd_kernel, heads=heads, dim=dim,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, 3 * width), qkv.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, 3 * width), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, seq, 3 * width), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=7 * bsz * seq * width * qkv.dtype.itemsize,
            transcendentals=bsz * heads * seq * seq,
        ),
        interpret=interpret,
    )(qkv, mask, g)


def _fa_vjp_fwd(qkv, mask, heads, interpret):
    return fused_attention_qkv(qkv, mask, heads=heads, interpret=interpret), (qkv, mask)


def _fa_vjp_bwd(heads, interpret, res, g):
    # The XLA-derived backward is deliberately the default: under the
    # trainer's remat it measured 71.3 ms/step (B=256 text branch) vs 95.9 ms
    # for the hand-written kernel (fused_attention_qkv_bwd) — XLA fuses the
    # remat recompute with its own backward and shares the probability-matrix
    # recomputation, which an opaque custom call cannot participate in. The
    # kernel wins nothing even without remat (71.2 vs 72.5). Measured on v5e;
    # see docs/PERF_NOTES.md.
    del interpret
    qkv, mask = res
    _, vjp = jax.vjp(lambda t: _attention_qkv_xla(t, mask, heads), qkv)
    (dqkv,) = vjp(g.astype(qkv.dtype))
    return dqkv, jnp.zeros_like(mask)


fused_attention_qkv_vjp.defvjp(_fa_vjp_fwd, _fa_vjp_bwd)
