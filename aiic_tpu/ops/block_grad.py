"""Whole-text-block backward kernel (round-2 VERDICT next-step #2).

Round-2 measured the training text-tower backward at 49.4 ms/step (B=256)
with only ~11 ms of matmul — the rest is diffuse fp32 elementwise fusions
(LN / quick-gelu / softmax cotangents at 1.5-3 ms each) plus ~5 ms of
einsum-backward relayout copies, and a core-only backward kernel LOSES
under remat because XLA shares the probability-matrix recompute with its
own derived backward (docs/PERF_NOTES.md). The fix is one program that owns
the WHOLE block backward: recompute every forward intermediate in VMEM from
the block input (the remat trade, but with zero HBM round-trips between
stages) and emit the input cotangent plus all six LoRA-factor cotangents.

Forward being differentiated (the training text block, reference
train_lora.py:76-98 attach set — out_proj, c_fc, c_proj; no dropout):

    h1 = LN1(x);  qkv = h1 Wqkv + b
    a  = attention(qkv)                      (clamped exp2 softmax — the
                                              same numerics as the Pallas
                                              forward kernels)
    y1 = x + a Wo + bo + s (a Ao) Bo
    h2 = LN2(y1); f = h2 W1 + b1 + s (h2 Af) Bf
    u  = f sigmoid(1.702 f)
    y  = y1 + u W2 + b2 + s (u Ap) Bp

The backward needs cotangents for x and the six LoRA factors only — the
backbone is frozen (value_and_grad runs over the adapter tree; zero
cotangents returned for weights are dead code XLA eliminates).

LoRA-factor cotangents are cross-batch reductions: the kernel accumulates
them in fp32 output blocks revisited across the sequential grid (the
standard K-loop accumulation pattern), initialized at program_id 0.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aiic_tpu.ops.attention import LOG2E, _denom_guard, _mm_prec, exp2_rows
from aiic_tpu.ops.quant import _row_quant

Params = Dict[str, Any]

# Scoped-VMEM budget for the whole-block kernels. Coarser than ops/quant's
# estimators (whole-block peak-live is harder to attribute), calibrated so the
# known-good geometry passes: the ViT-B/16 TEXT tower at G=2 estimates
# ~14.3 MB and is measured to fit on v5e; the L/14-class 768-wide text tower
# estimates ~20 MB at G=1 and must be rejected (the hard ceiling is ~16 MB).
_BLOCK_VMEM_BUDGET = 15 * 1024 * 1024


def _text_block_vmem_bytes(group: int, seq: int, width: int, mlp_dim: int,
                           heads: int, itemsize: int) -> int:
    """Peak-live estimate for the backward kernel (the larger of the pair)."""
    rows = group * seq
    weights = (4 * width * width + 2 * width * mlp_dim) * itemsize
    return weights + (
        3 * rows * width * itemsize        # x + dy in, dx out blocks
        + seq * seq * 4                    # mask
        + rows * 3 * width * (4 + itemsize)  # QKV accumulator + cast
        + group * heads * seq * seq * 4    # per-head probabilities kept for bwd
        + 3 * rows * mlp_dim * 4           # f / sigmoid / u fp32 slabs
        + 6 * rows * width * 4             # fp32 (rows, W) intermediates
    )


def text_block_fits(seq: int, width: int, mlp_dim: int, heads: int,
                    itemsize: int = 2) -> bool:
    """True when the UNCHUNKED whole-block kernel pair fits scoped VMEM at
    G>=1 for this geometry (all weights + the full MLP hidden axis resident).
    Wider towers may still run the kernel pair via hidden-axis chunking —
    see ``text_block_plan`` / ``text_block_supported``."""
    return _text_block_vmem_bytes(1, seq, width, mlp_dim, heads,
                                  itemsize) <= _BLOCK_VMEM_BUDGET


def _text_block_chunk_vmem_bytes(group: int, seq: int, width: int,
                                 mlp_dim: int, heads: int, n_chunks: int,
                                 itemsize: int) -> int:
    """Peak-live estimate for the hidden-axis-CHUNKED backward kernel: only
    one (W, M/C)+(M/C, W) weight-chunk pair streams per grid step (double-
    buffered); the attention-half stashes and the chunk-loop accumulators
    persist in scratch. LoRA factors/accumulators are bounded by a fixed
    r<=64 allowance plus a 1 MB slop term.

    Calibrated against real v5e Mosaic scoped-allocation reports at the
    L/14 text geometry INSIDE the production scan+grad composition (the
    standalone kernel at the same blocking allocates ~2.4 MB LESS — large
    grids inside a scanned gradient pay extra multiple-buffering): measured
    (S=77, W=768, M=3072, H=12, bf16, rows=304) (G=2,C=8) -> 16.70 MB and
    (G=1,C=4) -> 17.09 MB, both over the 16 MB ceiling, while (G=2,C=12),
    (G=2,C=24) and (G=1,C=8) compile. The fp32 QKV accumulator term (also
    in the unchunked estimator) puts the two failures above the 15 MB
    budget and keeps the passes under it."""
    rows = group * seq
    chunk = mlp_dim // n_chunks
    return (
        4 * width * width * itemsize           # wqkv + wo resident
        + 2 * 2 * width * chunk * itemsize     # streamed W1/W2 pair, x2 buffers
        + 2 * 3 * rows * width * itemsize      # x + dy in (buffered) + dx out
        + seq * seq * 4                        # mask
        + rows * 3 * width * (4 + itemsize)    # qkv fp32 accumulator + stash
        + group * heads * seq * seq * 4        # per-head probabilities stash
        + 2 * rows * width * itemsize          # a + h2 stashes (compute dtype)
        + 2 * rows * width * 4                 # xhat2 + dh2 fp32
        + 5 * rows * chunk * 4                 # f/sig/u/du/dfq transients
        + 2 * 64 * mlp_dim * 4                 # dafB/dapA full fp32 outputs
        + (1 << 20)                            # lora factors + small stashes
    )


def text_block_plan(seq: int, width: int, mlp_dim: int, heads: int,
                    itemsize: int = 2, bsz: int | None = None):
    """(group, n_chunks) blocking for the whole-block kernel pair, or None
    when no blocking fits scoped VMEM.

    Preference order: largest image group first (G=2 halves the streamed-
    weight traffic per row — the dominant cost of chunking — and amortizes
    the seq->sublane padding), then the unchunked form, then the smallest
    chunk count. The total streamed bytes per group are C-independent, so
    any C that fits at G=2 beats every G=1 blocking.

    Chunk sizes must be LANE-ALIGNED: the streamed (W, M/C) / (M/C, W)
    weight blocks need their M/C dimension to be a multiple of 128 or
    Mosaic rejects the block spec (M=3072 admits C in {2,3,4,6,8,12,24},
    NOT 16)."""
    for g in (2, 1):
        if bsz is not None and bsz % g:
            continue
        if _text_block_vmem_bytes(g, seq, width, mlp_dim, heads,
                                  itemsize) <= _BLOCK_VMEM_BUDGET:
            return (g, 1)
        for c in range(2, mlp_dim // 128 + 1):
            if mlp_dim % c or (mlp_dim // c) % 128:
                continue
            if _text_block_chunk_vmem_bytes(g, seq, width, mlp_dim, heads,
                                            c, itemsize) <= _BLOCK_VMEM_BUDGET:
                return (g, c)
    return None


def text_block_supported(seq: int, width: int, mlp_dim: int, heads: int,
                         itemsize: int = 2) -> bool:
    """True when SOME whole-block blocking (unchunked or hidden-axis-chunked)
    fits this geometry — the trainer's ``block_fused`` gate. ViT-B/16-class
    text towers (W=512) take the unchunked kernels; L/14-class towers
    (W=768, M=3072) stream the MLP hidden axis in chunks."""
    return text_block_plan(seq, width, mlp_dim, heads, itemsize) is not None


def _pick_group(bsz: int, seq: int, width: int, mlp_dim: int, heads: int,
                itemsize: int, want: int) -> int:
    group = want if itemsize <= 2 else 1
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)
    while group > 1 and _text_block_vmem_bytes(
            group, seq, width, mlp_dim, heads, itemsize) > _BLOCK_VMEM_BUDGET:
        group //= 2
    if _text_block_vmem_bytes(group, seq, width, mlp_dim, heads,
                              itemsize) > _BLOCK_VMEM_BUDGET:
        raise ValueError(
            f"text block geometry (S={seq}, W={width}, M={mlp_dim}) exceeds "
            "the whole-block kernel's VMEM budget even at G=1; use "
            "attn_impl='pallas_vjp' or 'xla' (train.trainer falls back "
            "automatically via text_block_fits)")
    return group


def _ln_fwd(xf: jnp.ndarray, scale, bias, eps: float):
    """fp32 LN forward returning (out, xhat, inv_sigma) for reuse in bwd."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dh: jnp.ndarray, xhat: jnp.ndarray, inv: jnp.ndarray, scale):
    """Cotangent wrt LN input given cotangent of LN output (fp32)."""
    g = dh * scale
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    return inv * (g - gm - xhat * gx)


def _qgelu_fwd(f: jnp.ndarray):
    sig = jax.nn.sigmoid(1.702 * f)
    return f * sig, sig


def _text_block_bwd_kernel(
    x_ref, dy_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref,
    dx_ref, daoA_ref, daoB_ref, dafA_ref, dafB_ref, dapA_ref, dapB_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
):
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        daoA_ref[:] = jnp.zeros_like(daoA_ref)
        daoB_ref[:] = jnp.zeros_like(daoB_ref)
        dafA_ref[:] = jnp.zeros_like(dafA_ref)
        dafB_ref[:] = jnp.zeros_like(dafB_ref)
        dapA_ref[:] = jnp.zeros_like(dapA_ref)
        dapB_ref[:] = jnp.zeros_like(dapB_ref)

    mask = mask_ref[:] * jnp.float32(LOG2E)  # natural-log mask -> log2 domain
    cdt = x_ref.dtype  # compute dtype for MXU operands (bf16 in production)

    def dot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    ln1s = ln1s_ref[:].astype(jnp.float32)
    ln2s = ln2s_ref[:].astype(jnp.float32)

    group = x_ref.shape[0]
    for gidx in range(group):
        x = x_ref[gidx]
        dy = dy_ref[gidx].astype(jnp.float32)

        # ---- forward recompute (everything VMEM-resident) ----------------
        xf = x.astype(jnp.float32)
        h1f, xhat1, inv1 = _ln_fwd(xf, ln1s, ln1b_ref[:].astype(jnp.float32), eps)
        h1 = h1f.astype(cdt)
        qkv = dot(h1, wqkv_ref[:], (((1,), (0,)))) + bqkv_ref[:].astype(jnp.float32)
        qkv = qkv.astype(cdt)  # (S, 3W)

        probs = []  # per-head normalized fp32 probabilities (kept for bwd)
        outs = []
        for hd in range(heads):
            q = qkv[:, hd * dim:(hd + 1) * dim]
            k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
            v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            qs = q * jnp.asarray(scale * LOG2E, cdt)
            s = dot(qs, k, ((1,), (1,)))
            p = exp2_rows(s + mask)
            p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
            probs.append(p)
            outs.append(dot(p, v, ((1,), (0,))).astype(cdt))
        a = jnp.concatenate(outs, axis=-1)  # (S, W)

        a_ao = dot(a, aoA_ref[:], ((1,), (0,)))  # (S, r) fp32
        ao = (dot(a, wo_ref[:], ((1,), (0,)))
              + bo_ref[:].astype(jnp.float32)
              + scaling * dot(a_ao, aoB_ref[:], ((1,), (0,))))
        y1 = xf + ao  # fp32 (S, W)

        h2f, xhat2, inv2 = _ln_fwd(y1, ln2s, ln2b_ref[:].astype(jnp.float32), eps)
        h2 = h2f.astype(cdt)
        h2_af = dot(h2, afA_ref[:], ((1,), (0,)))  # (S, r)
        f = (dot(h2, w1_ref[:], ((1,), (0,)))
             + b1_ref[:].astype(jnp.float32)
             + scaling * dot(h2_af, afB_ref[:], ((1,), (0,))))  # (S, M) fp32
        u, sig = _qgelu_fwd(f)
        u_c = u.astype(cdt)
        u_ap = dot(u_c, apA_ref[:], ((1,), (0,)))  # (S, r)

        # ---- backward ----------------------------------------------------
        # MLP half: y = y1 + u W2 + b2 + s (u Ap) Bp
        dmo = dy  # (S, W) fp32
        t_p = dot(dmo, apB_ref[:], ((1,), (1,)))            # dmo Bp^T (S, r)
        du = dot(dmo, w2_ref[:], ((1,), (1,))) + scaling * dot(t_p, apA_ref[:], ((1,), (1,)))
        dapA_ref[:] += scaling * dot(u_c, t_p, ((0,), (0,)))      # u^T t (M, r)
        dapB_ref[:] += scaling * dot(u_ap, dmo, ((0,), (0,)))     # (r, W)

        dfq = du * (sig + 1.702 * f * sig * (1.0 - sig))    # quick-gelu'
        t_f = dot(dfq, afB_ref[:], ((1,), (1,)))            # df Bf^T (S, r)
        dh2 = dot(dfq, w1_ref[:], ((1,), (1,))) + scaling * dot(t_f, afA_ref[:], ((1,), (1,)))
        dafA_ref[:] += scaling * dot(h2, t_f, ((0,), (0,)))       # (W, r)
        dafB_ref[:] += scaling * dot(h2_af, dfq, ((0,), (0,)))    # (r, M)

        dy1 = dy + _ln_bwd(dh2, xhat2, inv2, ln2s)

        # attention half: y1 = x + a Wo + bo + s (a Ao) Bo
        dao = dy1
        t_o = dot(dao, aoB_ref[:], ((1,), (1,)))            # dao Bo^T (S, r)
        da = dot(dao, wo_ref[:], ((1,), (1,))) + scaling * dot(t_o, aoA_ref[:], ((1,), (1,)))
        daoA_ref[:] += scaling * dot(a, t_o, ((0,), (0,)))        # (W, r)
        daoB_ref[:] += scaling * dot(a_ao, dao, ((0,), (0,)))     # (r, W)

        # attention core backward per head (probabilities kept from fwd)
        dqs, dks, dvs = [], [], []
        for hd in range(heads):
            p = probs[hd]
            q = qkv[:, hd * dim:(hd + 1) * dim]
            k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
            v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            gh = da[:, hd * dim:(hd + 1) * dim]
            dv = dot(p, gh, ((0,), (0,)))                   # p^T g
            dp = dot(gh, v, ((1,), (1,)))                   # g v^T
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = ds * scale
            dq = dot(ds, k, ((1,), (0,)))
            dk = dot(ds, q, ((0,), (0,)))                   # ds^T q
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        dqkv = jnp.concatenate(
            [jnp.concatenate(dqs, axis=-1),
             jnp.concatenate(dks, axis=-1),
             jnp.concatenate(dvs, axis=-1)], axis=-1)       # (S, 3W) fp32

        dh1 = dot(dqkv, wqkv_ref[:], ((1,), (1,)))          # dqkv Wqkv^T
        dx = dy1 + _ln_bwd(dh1, xhat1, inv1, ln1s)
        dx_ref[gidx] = dx.astype(dx_ref.dtype)


def _text_block_fwd_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref,
    y_ref, *, heads: int, dim: int, scale: float, scaling: float, eps: float,
):
    """Whole-block FORWARD in one program (the same math the backward kernel
    recomputes — deliberately mirrored line-for-line so forward and backward
    share numerics exactly)."""
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)
    mask = mask_ref[:] * jnp.float32(LOG2E)
    cdt = x_ref.dtype

    def dot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    ln1s = ln1s_ref[:].astype(jnp.float32)
    ln2s = ln2s_ref[:].astype(jnp.float32)

    group = x_ref.shape[0]
    for gidx in range(group):
        x = x_ref[gidx]
        xf = x.astype(jnp.float32)
        h1f, _, _ = _ln_fwd(xf, ln1s, ln1b_ref[:].astype(jnp.float32), eps)
        h1 = h1f.astype(cdt)
        qkv = dot(h1, wqkv_ref[:], ((1,), (0,))) + bqkv_ref[:].astype(jnp.float32)
        qkv = qkv.astype(cdt)

        outs = []
        for hd in range(heads):
            q = qkv[:, hd * dim:(hd + 1) * dim]
            k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
            v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            qs = q * jnp.asarray(scale * LOG2E, cdt)
            s = dot(qs, k, ((1,), (1,)))
            p = exp2_rows(s + mask)
            p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
            outs.append(dot(p, v, ((1,), (0,))).astype(cdt))
        a = jnp.concatenate(outs, axis=-1)

        a_ao = dot(a, aoA_ref[:], ((1,), (0,)))
        ao = (dot(a, wo_ref[:], ((1,), (0,)))
              + bo_ref[:].astype(jnp.float32)
              + scaling * dot(a_ao, aoB_ref[:], ((1,), (0,))))
        y1 = xf + ao

        h2f, _, _ = _ln_fwd(y1, ln2s, ln2b_ref[:].astype(jnp.float32), eps)
        h2 = h2f.astype(cdt)
        h2_af = dot(h2, afA_ref[:], ((1,), (0,)))
        f = (dot(h2, w1_ref[:], ((1,), (0,)))
             + b1_ref[:].astype(jnp.float32)
             + scaling * dot(h2_af, afB_ref[:], ((1,), (0,))))
        u, _sig = _qgelu_fwd(f)
        u_c = u.astype(cdt)
        u_ap = dot(u_c, apA_ref[:], ((1,), (0,)))
        mo = (dot(u_c, w2_ref[:], ((1,), (0,)))
              + b2_ref[:].astype(jnp.float32)
              + scaling * dot(u_ap, apB_ref[:], ((1,), (0,))))
        y_ref[gidx] = (y1 + mo).astype(y_ref.dtype)


def _text_block_fwd_chunk_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1c_ref, b1c_ref, w2c_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afBc_ref, apAc_ref, apB_ref,
    y_ref,
    acc_ref, h2_ref, h2af_ref, uap_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
    n_chunks: int,
):
    """Hidden-axis-chunked whole-block FORWARD: grid (batch groups, chunks).
    Wide text towers (e.g. ViT-L/14's W=768/M=3072, whose resident weights
    alone exceed scoped VMEM) stream one (W, M/C)+(M/C, W) weight-chunk pair
    per grid step — the serving int8 MLP's technique (ops/quant.
    _int8_mlp_chunk_kernel) applied to the training block kernels. Chunk 0
    runs the attention half and LN2 once, stashing y1 (the output
    accumulator seed) and h2; every chunk adds its gelu(h2 W1_c) W2_c
    partial. The math is the unchunked kernel's line-for-line: the MLP
    contractions split only the hidden axis, so f/u values are bit-identical
    and the c_proj accumulation differs only in fp32 summation order."""
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)
    cdt = x_ref.dtype
    group, seq, _ = x_ref.shape
    rows = group * seq
    c = pl.program_id(1)

    def dot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(c == 0)
    def _stage_attention_half():
        mask = mask_ref[:] * jnp.float32(LOG2E)
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        ln2b = ln2b_ref[:].astype(jnp.float32)
        for gidx in range(group):
            xf = x_ref[gidx].astype(jnp.float32)
            h1f, _, _ = _ln_fwd(xf, ln1s, ln1b, eps)
            h1 = h1f.astype(cdt)
            qkv = dot(h1, wqkv_ref[:], ((1,), (0,))) + bqkv_ref[:].astype(jnp.float32)
            qkv = qkv.astype(cdt)
            outs = []
            for hd in range(heads):
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                qs = q * jnp.asarray(scale * LOG2E, cdt)
                s = dot(qs, k, ((1,), (1,)))
                p = exp2_rows(s + mask)
                p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
                outs.append(dot(p, v, ((1,), (0,))).astype(cdt))
            a = jnp.concatenate(outs, axis=-1)
            a_ao = dot(a, aoA_ref[:], ((1,), (0,)))
            ao = (dot(a, wo_ref[:], ((1,), (0,)))
                  + bo_ref[:].astype(jnp.float32)
                  + scaling * dot(a_ao, aoB_ref[:], ((1,), (0,))))
            y1 = xf + ao
            h2f, _, _ = _ln_fwd(y1, ln2s, ln2b, eps)
            acc_ref[gidx * seq:(gidx + 1) * seq] = y1
            h2_ref[gidx * seq:(gidx + 1) * seq] = h2f.astype(cdt)
        h2af_ref[:] = dot(h2_ref[:], afA_ref[:], ((1,), (0,)))
        uap_ref[:] = jnp.zeros_like(uap_ref)

    h2 = h2_ref[:]
    f = (dot(h2, w1c_ref[:], ((1,), (0,)))
         + b1c_ref[:].astype(jnp.float32)
         + scaling * dot(h2af_ref[:], afBc_ref[:], ((1,), (0,))))
    u, _sig = _qgelu_fwd(f)
    u_c = u.astype(cdt)
    acc_ref[:] += dot(u_c, w2c_ref[:], ((1,), (0,)))
    uap_ref[:] += dot(u_c, apAc_ref[:], ((1,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _emit():
        y = (acc_ref[:] + b2_ref[:].astype(jnp.float32)
             + scaling * dot(uap_ref[:], apB_ref[:], ((1,), (0,))))
        y_ref[:] = y.reshape(group, seq, width).astype(y_ref.dtype)


def _text_block_bwd_chunk_kernel(
    x_ref, dy_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1c_ref, b1c_ref, w2c_ref,
    aoA_ref, aoB_ref, afA_ref, afBc_ref, apAc_ref, apB_ref,
    dx_ref, daoA_ref, daoB_ref, dafA_ref, dafB_ref, dapA_ref, dapB_ref,
    qkv_ref, probs_ref, a_ref, aao_ref, xhat2_ref, inv2_ref,
    h2_ref, h2af_ref, tp_ref, tf_ref, uap_ref, dh2_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
    n_chunks: int, chunk: int,
):
    """Hidden-axis-chunked whole-block BACKWARD: grid (batch groups, chunks).

    Chunk 0 recomputes the attention half once (qkv / probabilities / a /
    LN2 stats stashed in scratch) and seeds the chunk-loop accumulators;
    every chunk recomputes its f/gelu slab, accumulates the backbone dh2
    partial and the cross-chunk LoRA reductions (t_f, u_ap), and writes its
    disjoint slice of the chunk-sliced cotangents (dBf columns, dAp rows);
    the last chunk closes LN2, runs the attention-half backward from the
    stashes, and emits dx. LoRA cotangents accumulate directly in the
    fp32 output blocks (constant index map -> consecutive revisiting across
    the whole grid, the same pattern as the unchunked kernel), zeroed at
    grid step (0, 0)."""
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)
    cdt = x_ref.dtype
    group, seq, _ = x_ref.shape
    rows = group * seq
    b = pl.program_id(0)
    c = pl.program_id(1)

    def dot(a, b_, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b_.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _zero_lora_grads():
        daoA_ref[:] = jnp.zeros_like(daoA_ref)
        daoB_ref[:] = jnp.zeros_like(daoB_ref)
        dafA_ref[:] = jnp.zeros_like(dafA_ref)
        dafB_ref[:] = jnp.zeros_like(dafB_ref)
        dapA_ref[:] = jnp.zeros_like(dapA_ref)
        dapB_ref[:] = jnp.zeros_like(dapB_ref)

    dy = dy_ref[:].reshape(rows, width).astype(jnp.float32)

    @pl.when(c == 0)
    def _stage_attention_half():
        mask = mask_ref[:] * jnp.float32(LOG2E)
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        ln2b = ln2b_ref[:].astype(jnp.float32)
        for gidx in range(group):
            xf = x_ref[gidx].astype(jnp.float32)
            h1f, _, _ = _ln_fwd(xf, ln1s, ln1b, eps)
            h1 = h1f.astype(cdt)
            qkv = dot(h1, wqkv_ref[:], ((1,), (0,))) + bqkv_ref[:].astype(jnp.float32)
            qkv = qkv.astype(cdt)
            qkv_ref[gidx] = qkv
            outs = []
            for hd in range(heads):
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                qs = q * jnp.asarray(scale * LOG2E, cdt)
                s = dot(qs, k, ((1,), (1,)))
                p = exp2_rows(s + mask)
                p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
                probs_ref[gidx, hd] = p
                outs.append(dot(p, v, ((1,), (0,))).astype(cdt))
            a_ref[gidx] = jnp.concatenate(outs, axis=-1)
        a = a_ref[:].reshape(rows, width)
        aao_ref[:] = dot(a, aoA_ref[:], ((1,), (0,)))
        xf = x_ref[:].reshape(rows, width).astype(jnp.float32)
        ao = (dot(a, wo_ref[:], ((1,), (0,)))
              + bo_ref[:].astype(jnp.float32)
              + scaling * dot(aao_ref[:], aoB_ref[:], ((1,), (0,))))
        y1 = xf + ao
        h2f, xhat2, inv2 = _ln_fwd(y1, ln2s, ln2b, eps)
        xhat2_ref[:] = xhat2
        inv2_ref[:] = inv2
        h2_ref[:] = h2f.astype(cdt)
        h2af_ref[:] = dot(h2f.astype(cdt), afA_ref[:], ((1,), (0,)))
        tp_ref[:] = dot(dy, apB_ref[:], ((1,), (1,)))
        tf_ref[:] = jnp.zeros_like(tf_ref)
        uap_ref[:] = jnp.zeros_like(uap_ref)
        dh2_ref[:] = jnp.zeros_like(dh2_ref)

    # ---- per-chunk MLP backward (f/gelu recomputed per chunk) -------------
    h2 = h2_ref[:]
    f = (dot(h2, w1c_ref[:], ((1,), (0,)))
         + b1c_ref[:].astype(jnp.float32)
         + scaling * dot(h2af_ref[:], afBc_ref[:], ((1,), (0,))))
    u, sig = _qgelu_fwd(f)
    u_c = u.astype(cdt)
    du = (dot(dy, w2c_ref[:], ((1,), (1,)))
          + scaling * dot(tp_ref[:], apAc_ref[:], ((1,), (1,))))
    dfq = du * (sig + 1.702 * f * sig * (1.0 - sig))
    dh2_ref[:] += dot(dfq, w1c_ref[:], ((1,), (1,)))
    tf_ref[:] += dot(dfq, afBc_ref[:], ((1,), (1,)))
    uap_ref[:] += dot(u_c, apAc_ref[:], ((1,), (0,)))
    dafB_ref[:, pl.dslice(c * chunk, chunk)] += scaling * dot(
        h2af_ref[:], dfq, ((0,), (0,)))
    dapA_ref[pl.dslice(c * chunk, chunk), :] += scaling * dot(
        u_c, tp_ref[:], ((0,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _close():
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        dh2 = dh2_ref[:] + scaling * dot(tf_ref[:], afA_ref[:], ((1,), (1,)))
        dafA_ref[:] += scaling * dot(h2, tf_ref[:], ((0,), (0,)))
        dapB_ref[:] += scaling * dot(uap_ref[:], dy, ((0,), (0,)))
        dy1 = dy + _ln_bwd(dh2, xhat2_ref[:], inv2_ref[:], ln2s)

        dao = dy1
        t_o = dot(dao, aoB_ref[:], ((1,), (1,)))
        da = dot(dao, wo_ref[:], ((1,), (1,))) + scaling * dot(t_o, aoA_ref[:], ((1,), (1,)))
        a = a_ref[:].reshape(rows, width)
        daoA_ref[:] += scaling * dot(a, t_o, ((0,), (0,)))
        daoB_ref[:] += scaling * dot(aao_ref[:], dao, ((0,), (0,)))

        for gidx in range(group):
            qkv = qkv_ref[gidx]
            dqs, dks, dvs = [], [], []
            for hd in range(heads):
                p = probs_ref[gidx, hd]
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                gh = da[gidx * seq:(gidx + 1) * seq, hd * dim:(hd + 1) * dim]
                dv = dot(p, gh, ((0,), (0,)))
                dp = dot(gh, v, ((1,), (1,)))
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds = ds * scale
                dqs.append(dot(ds, k, ((1,), (0,))))
                dks.append(dot(ds, q, ((0,), (0,))))
                dvs.append(dv)
            dqkv = jnp.concatenate(
                [jnp.concatenate(dqs, axis=-1),
                 jnp.concatenate(dks, axis=-1),
                 jnp.concatenate(dvs, axis=-1)], axis=-1)
            dh1 = dot(dqkv, wqkv_ref[:], ((1,), (1,)))
            xf = x_ref[gidx].astype(jnp.float32)
            _, xhat1, inv1 = _ln_fwd(xf, ln1s, ln1b, eps)
            dx = dy1[gidx * seq:(gidx + 1) * seq] + _ln_bwd(dh1, xhat1, inv1, ln1s)
            dx_ref[gidx] = dx.astype(dx_ref.dtype)


def _weight_operands(bp: Params, lora: Params, cdt):
    def row(v):
        return v.reshape(1, -1)

    return (
        row(bp["ln1"]["scale"]).astype(cdt), row(bp["ln1"]["bias"]).astype(cdt),
        row(bp["ln2"]["scale"]).astype(cdt), row(bp["ln2"]["bias"]).astype(cdt),
        bp["attn"]["wqkv"].astype(cdt), row(bp["attn"]["bqkv"]).astype(cdt),
        bp["attn"]["wo"].astype(cdt), row(bp["attn"]["bo"]).astype(cdt),
        bp["mlp"]["w1"].astype(cdt), row(bp["mlp"]["b1"]).astype(cdt),
        bp["mlp"]["w2"].astype(cdt), row(bp["mlp"]["b2"]).astype(cdt),
        lora["out_proj"]["A"].astype(cdt), lora["out_proj"]["B"].astype(cdt),
        lora["c_fc"]["A"].astype(cdt), lora["c_fc"]["B"].astype(cdt),
        lora["c_proj"]["A"].astype(cdt), lora["c_proj"]["B"].astype(cdt),
    )


def _weight_specs(width: int, mlp: int, r_o: int, r_f: int, r_p: int):
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return [
        full((1, width)), full((1, width)), full((1, width)), full((1, width)),
        full((width, 3 * width)), full((1, 3 * width)),
        full((width, width)), full((1, width)),
        full((width, mlp)), full((1, mlp)), full((mlp, width)), full((1, width)),
        full((width, r_o)), full((r_o, width)),
        full((width, r_f)), full((r_f, mlp)),
        full((mlp, r_p)), full((r_p, width)),
    ]


def _resolve_plan(bsz, seq, width, mlp, heads, itemsize, force_plan):
    """(group, n_chunks) honoring batch divisibility; raises the VMEM-budget
    ValueError when no blocking fits (callers gate via text_block_supported)."""
    if force_plan is not None:
        group, n_chunks = force_plan
    else:
        plan = text_block_plan(seq, width, mlp, heads, itemsize, bsz=bsz)
        if plan is None:
            raise ValueError(
                f"text block geometry (S={seq}, W={width}, M={mlp}) exceeds "
                "the whole-block kernel's VMEM budget even hidden-axis-"
                "chunked at G=1; use attn_impl='pallas_vjp' or 'xla' "
                "(train.trainer falls back automatically via "
                "text_block_supported)")
        group, n_chunks = plan
    while bsz % group:
        group //= 2
    return max(group, 1), n_chunks


def _chunked_weight_operands(bp: Params, lora: Params, cdt, *, with_b2: bool):
    """Operand list for the chunked kernels: same tensors as
    _weight_operands, reordered so the streamed W1/b1/W2 (+Bf/Ap) sit in the
    chunk-indexed spec slots; the backward drops b2 (unused there)."""
    row = lambda v: v.reshape(1, -1)
    ops = [
        row(bp["ln1"]["scale"]).astype(cdt), row(bp["ln1"]["bias"]).astype(cdt),
        row(bp["ln2"]["scale"]).astype(cdt), row(bp["ln2"]["bias"]).astype(cdt),
        bp["attn"]["wqkv"].astype(cdt), row(bp["attn"]["bqkv"]).astype(cdt),
        bp["attn"]["wo"].astype(cdt), row(bp["attn"]["bo"]).astype(cdt),
        bp["mlp"]["w1"].astype(cdt), row(bp["mlp"]["b1"]).astype(cdt),
        bp["mlp"]["w2"].astype(cdt),
    ]
    if with_b2:
        ops.append(row(bp["mlp"]["b2"]).astype(cdt))
    ops += [
        lora["out_proj"]["A"].astype(cdt), lora["out_proj"]["B"].astype(cdt),
        lora["c_fc"]["A"].astype(cdt), lora["c_fc"]["B"].astype(cdt),
        lora["c_proj"]["A"].astype(cdt), lora["c_proj"]["B"].astype(cdt),
    ]
    return ops


def _chunked_weight_specs(width: int, mlp: int, chunk: int,
                          r_o: int, r_f: int, r_p: int, *, with_b2: bool):
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    specs = [
        const((1, width)), const((1, width)), const((1, width)), const((1, width)),
        const((width, 3 * width)), const((1, 3 * width)),
        const((width, width)), const((1, width)),
        pl.BlockSpec((width, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, width), lambda b, c: (c, 0), memory_space=pltpu.VMEM),
    ]
    if with_b2:
        specs.append(const((1, width)))
    specs += [
        const((width, r_o)), const((r_o, width)),
        const((width, r_f)),
        pl.BlockSpec((r_f, chunk), lambda b, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, r_p), lambda b, c: (c, 0), memory_space=pltpu.VMEM),
        const((r_p, width)),
    ]
    return specs


def text_block_fwd(
    x: jnp.ndarray, mask: jnp.ndarray, bp: Params, lora: Params, *,
    heads: int, scaling: float, eps: float = 1e-5, interpret: bool = False,
    force_plan: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(B,S,W) -> (B,S,W): the whole text block forward in one program.

    Geometries whose resident weights exceed scoped VMEM (W>=768 towers)
    stream the MLP hidden axis in chunks (_text_block_fwd_chunk_kernel);
    ``force_plan=(group, n_chunks)`` overrides the planner (tests)."""
    bsz, seq, width = x.shape
    dim = width // heads
    mlp = bp["mlp"]["w1"].shape[-1]
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    cdt = x.dtype

    group, n_chunks = _resolve_plan(bsz, seq, width, mlp, heads,
                                    x.dtype.itemsize, force_plan)
    if n_chunks > 1:
        chunk = mlp // n_chunks
        rows = group * seq
        return pl.pallas_call(
            functools.partial(_text_block_fwd_chunk_kernel, heads=heads,
                              dim=dim, scale=dim ** -0.5, scaling=scaling,
                              eps=eps, n_chunks=n_chunks),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group, n_chunks),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((seq, seq), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM),
                *_chunked_weight_specs(width, mlp, chunk, r_o, r_f, r_p,
                                       with_b2=True),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, width), jnp.float32),   # y1 / output acc
                pltpu.VMEM((rows, width), cdt),           # h2
                pltpu.VMEM((rows, r_f), jnp.float32),     # h2 @ Af
                pltpu.VMEM((rows, r_p), jnp.float32),     # u @ Ap accumulator
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * seq * width * (4 * width + 2 * mlp)
                + 4 * bsz * heads * seq * seq * dim,
                bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
                + (bsz // group) * (3 * width * width + 2 * width * mlp)
                * x.dtype.itemsize,
                transcendentals=bsz * (heads * seq * seq + seq * mlp),
            ),
            interpret=interpret,
        )(x, mask.astype(jnp.float32),
          *_chunked_weight_operands(bp, lora, cdt, with_b2=True))

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_text_block_fwd_kernel, heads=heads, dim=dim,
                          scale=dim ** -0.5, scaling=scaling, eps=eps),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full((seq, seq)),
            *_weight_specs(width, mlp, r_o, r_f, r_p),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
            + (3 * width * width + 2 * width * mlp) * x.dtype.itemsize,
            transcendentals=bsz * (heads * seq * seq + seq * mlp),
        ),
        interpret=interpret,
    )(x, mask.astype(jnp.float32), *_weight_operands(bp, lora, cdt))


def _text_block_bwd_chunked(
    x, dy, mask, bp, lora, *, group: int, n_chunks: int, heads: int,
    dim: int, scaling: float, eps: float, interpret: bool,
) -> Tuple[jnp.ndarray, Params]:
    bsz, seq, width = x.shape
    mlp = bp["mlp"]["w1"].shape[-1]
    chunk = mlp // n_chunks
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    cdt = x.dtype
    rows = group * seq

    out_shapes = (
        jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        jax.ShapeDtypeStruct((width, r_o), jnp.float32),
        jax.ShapeDtypeStruct((r_o, width), jnp.float32),
        jax.ShapeDtypeStruct((width, r_f), jnp.float32),
        jax.ShapeDtypeStruct((r_f, mlp), jnp.float32),
        jax.ShapeDtypeStruct((mlp, r_p), jnp.float32),
        jax.ShapeDtypeStruct((r_p, width), jnp.float32),
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_text_block_bwd_chunk_kernel, heads=heads, dim=dim,
                          scale=dim ** -0.5, scaling=scaling, eps=eps,
                          n_chunks=n_chunks, chunk=chunk),
        out_shape=out_shapes,
        grid=(bsz // group, n_chunks),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            *_chunked_weight_specs(width, mlp, chunk, r_o, r_f, r_p,
                                   with_b2=False),
        ],
        out_specs=(
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((width, r_o)), const((r_o, width)),
            const((width, r_f)), const((r_f, mlp)),
            const((mlp, r_p)), const((r_p, width)),
        ),
        scratch_shapes=[
            pltpu.VMEM((group, seq, 3 * width), cdt),          # qkv
            pltpu.VMEM((group, heads, seq, seq), jnp.float32),  # probabilities
            pltpu.VMEM((group, seq, width), cdt),              # a
            pltpu.VMEM((rows, r_o), jnp.float32),              # a @ Ao
            pltpu.VMEM((rows, width), jnp.float32),            # xhat2
            pltpu.VMEM((rows, 1), jnp.float32),                # inv2
            pltpu.VMEM((rows, width), cdt),                    # h2
            pltpu.VMEM((rows, r_f), jnp.float32),              # h2 @ Af
            pltpu.VMEM((rows, r_p), jnp.float32),              # dy @ Bp^T
            pltpu.VMEM((rows, r_f), jnp.float32),              # t_f accumulator
            pltpu.VMEM((rows, r_p), jnp.float32),              # u @ Ap accumulator
            pltpu.VMEM((rows, width), jnp.float32),            # dh2 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 6 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * width * x.dtype.itemsize
            + (bsz // group) * (3 * width * width + 2 * width * mlp)
            * x.dtype.itemsize,
            transcendentals=bsz * (heads * seq * seq + 2 * seq * mlp),
        ),
        interpret=interpret,
    )(x, dy.astype(x.dtype), mask.astype(jnp.float32),
      *_chunked_weight_operands(bp, lora, cdt, with_b2=False))
    dx = outs[0]
    z = lora
    dlora = {
        "out_proj": {"A": outs[1].astype(z["out_proj"]["A"].dtype),
                     "B": outs[2].astype(z["out_proj"]["B"].dtype)},
        "c_fc": {"A": outs[3].astype(z["c_fc"]["A"].dtype),
                 "B": outs[4].astype(z["c_fc"]["B"].dtype)},
        "c_proj": {"A": outs[5].astype(z["c_proj"]["A"].dtype),
                   "B": outs[6].astype(z["c_proj"]["B"].dtype)},
    }
    return dx, dlora


def text_block_bwd(
    x: jnp.ndarray, dy: jnp.ndarray, mask: jnp.ndarray,
    bp: Params, lora: Params, *,
    heads: int, scaling: float, eps: float = 1e-5, interpret: bool = False,
    force_plan: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, Params]:
    """(B,S,W) x + output cotangent -> (dx, dlora) for one text block.

    Wide towers stream the MLP hidden axis (_text_block_bwd_chunk_kernel);
    ``force_plan=(group, n_chunks)`` overrides the planner (tests)."""
    bsz, seq, width = x.shape
    dim = width // heads
    mlp = bp["mlp"]["w1"].shape[-1]
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    cdt = x.dtype

    group, n_chunks = _resolve_plan(bsz, seq, width, mlp, heads,
                                    x.dtype.itemsize, force_plan)
    if n_chunks > 1:
        return _text_block_bwd_chunked(
            x, dy, mask, bp, lora, group=group, n_chunks=n_chunks,
            heads=heads, dim=dim, scaling=scaling, eps=eps,
            interpret=interpret)

    # Group images per grid step to amortize per-program overhead (the S=77
    # dots are small); bf16 fits 2 per step under the ~16 MB VMEM budget
    # (weights ~6.3 MB + ~4 MB fp32 intermediates per image). Larger
    # geometries shrink to whatever fits (AIIC_BLOCKBWD_G overrides the
    # preferred group of the unchunked kernel).
    if force_plan is None:
        try:
            want = int(os.environ.get("AIIC_BLOCKBWD_G", str(group)))
        except ValueError:
            want = group
        want = max(want, 1)  # _pick_group halves it to what fits / divides
        group = _pick_group(bsz, seq, width, mlp, heads, x.dtype.itemsize,
                            want=want)

    out_shapes = (
        jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        jax.ShapeDtypeStruct((width, r_o), jnp.float32),
        jax.ShapeDtypeStruct((r_o, width), jnp.float32),
        jax.ShapeDtypeStruct((width, r_f), jnp.float32),
        jax.ShapeDtypeStruct((r_f, mlp), jnp.float32),
        jax.ShapeDtypeStruct((mlp, r_p), jnp.float32),
        jax.ShapeDtypeStruct((r_p, width), jnp.float32),
    )
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_text_block_bwd_kernel, heads=heads, dim=dim,
                          scale=dim ** -0.5, scaling=scaling, eps=eps),
        out_shape=out_shapes,
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full((seq, seq)),
            *_weight_specs(width, mlp, r_o, r_f, r_p),
        ],
        out_specs=(
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full((width, r_o)), full((r_o, width)),
            full((width, r_f)), full((r_f, mlp)),
            full((mlp, r_p)), full((r_p, width)),
        ),
        cost_estimate=pl.CostEstimate(
            # fwd recompute + bwd ~ 3x the forward matmul work
            flops=3 * 2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 6 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * width * x.dtype.itemsize
            + (3 * width * width + 2 * width * mlp) * x.dtype.itemsize,
            transcendentals=bsz * (heads * seq * seq + seq * mlp),
        ),
        interpret=interpret,
    )(x, dy.astype(x.dtype), mask.astype(jnp.float32),
      *_weight_operands(bp, lora, cdt))
    dx = outs[0]
    z = lora  # dtype template
    dlora = {
        "out_proj": {"A": outs[1].astype(z["out_proj"]["A"].dtype),
                     "B": outs[2].astype(z["out_proj"]["B"].dtype)},
        "c_fc": {"A": outs[3].astype(z["c_fc"]["A"].dtype),
                 "B": outs[4].astype(z["c_fc"]["B"].dtype)},
        "c_proj": {"A": outs[5].astype(z["c_proj"]["A"].dtype),
                   "B": outs[6].astype(z["c_proj"]["B"].dtype)},
    }
    return dx, dlora


# ---------------------------------------------------------------------------
# int8 variant: serving-numerics training
# ---------------------------------------------------------------------------
#
# The serving engine precomputes text features through the int8 kernels
# (quantize_model quantizes BOTH towers), but the trainer's text branch runs
# bf16 — adapters were trained against numerics the deployed model never
# reproduces. These kernels close that gap AND double-pump the backbone
# matmuls: the forward mirrors the serving int8 composition (per-row
# activation quant -> int8 QKV / c_fc / c_proj MACs, bf16 attention core and
# output projection, LoRA deltas in bf16), and the backward differentiates
# it under the straight-through estimator (quantization treated as identity;
# cotangent matmuls themselves run int8 against the same quantized weights:
# dy @ (Wq*s)^T == rowquant(dy*s) @ Wq^T up to the cotangent's own
# quantization). Gradients therefore carry ~1e-2-relative quantization noise
# vs the bf16-exact path — gated by gradient-cosine tests and an end-metric
# training comparison, not bit-exactness.

QWeights = Dict[str, Any]


def _q_dot(v: jnp.ndarray, wq: jnp.ndarray, contract) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-quantize fp32 ``v`` and contract with an int8 weight; returns
    (int32 accumulator as fp32, per-row scale)."""
    vq, vs = _row_quant(v)
    acc = jax.lax.dot_general(
        vq, wq, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return acc.astype(jnp.float32), vs


def _int8_block_fwd_stage(x, mask, refs, *, heads, dim, scale, scaling, eps,
                          keep):
    """The int8 whole-block forward on one (S, W) image slab; ``refs`` is the
    loaded weight dict. With keep=True also returns every intermediate the
    backward needs (probs, qkv, a, a_ao, h2*, f, sig, u, xhat/inv pairs)."""
    (ln1s, ln1b, ln2s, ln2b, wqkv_q, sqkv, bqkv, wo, bo,
     w1q, s1, b1, w2q, s2, b2, aoA, aoB, afA, afB, apA, apB) = refs
    width = heads * dim
    cdt = x.dtype
    prec = _mm_prec(cdt)

    def bdot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    xf = x.astype(jnp.float32)
    h1f, xhat1, inv1 = _ln_fwd(xf, ln1s, ln1b, eps)
    acc, hs = _q_dot(h1f, wqkv_q, ((1,), (0,)))
    qkv_f = acc * hs * sqkv + bqkv
    qkv = qkv_f.astype(cdt)  # (S, 3W)

    probs, outs = [], []
    for hd in range(heads):
        q = qkv[:, hd * dim:(hd + 1) * dim]
        k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
        v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
        qs = q * jnp.asarray(scale * LOG2E, cdt)
        s = bdot(qs, k, ((1,), (1,)))
        p = exp2_rows(s + mask)
        p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
        if keep:
            probs.append(p)
        outs.append(bdot(p, v, ((1,), (0,))).astype(cdt))
    a = jnp.concatenate(outs, axis=-1)  # (S, W) cdt

    a_ao = bdot(a, aoA, ((1,), (0,)))
    ao = bdot(a, wo, ((1,), (0,))) + bo + scaling * bdot(a_ao, aoB, ((1,), (0,)))
    y1 = xf + ao

    h2f, xhat2, inv2 = _ln_fwd(y1, ln2s, ln2b, eps)
    h2 = h2f.astype(cdt)
    h2_af = bdot(h2, afA, ((1,), (0,)))
    acc1, h2s = _q_dot(h2f, w1q, ((1,), (0,)))
    f = acc1 * h2s * s1 + b1 + scaling * bdot(h2_af, afB, ((1,), (0,)))
    u, sig = _qgelu_fwd(f)
    u_c = u.astype(cdt)
    u_ap = bdot(u_c, apA, ((1,), (0,)))
    acc2, us = _q_dot(u, w2q, ((1,), (0,)))
    mo = acc2 * us * s2 + b2 + scaling * bdot(u_ap, apB, ((1,), (0,)))
    y = y1 + mo
    if not keep:
        return y, None
    return y, (xf, xhat1, inv1, qkv, probs, a, a_ao, y1, xhat2, inv2,
               h2, h2_af, f, sig, u_c, u_ap)


def _load_int8_refs(ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, wqkv_ref,
                    sqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref, s1_ref,
                    b1_ref, w2_ref, s2_ref, b2_ref, aoA_ref, aoB_ref,
                    afA_ref, afB_ref, apA_ref, apB_ref):
    f32 = lambda r: r[:].astype(jnp.float32)
    return (f32(ln1s_ref), f32(ln1b_ref), f32(ln2s_ref), f32(ln2b_ref),
            wqkv_ref[:], f32(sqkv_ref), f32(bqkv_ref), wo_ref[:],
            f32(bo_ref), w1_ref[:], f32(s1_ref), f32(b1_ref), w2_ref[:],
            f32(s2_ref), f32(b2_ref), aoA_ref[:], aoB_ref[:], afA_ref[:],
            afB_ref[:], apA_ref[:], apB_ref[:])


def _text_block_fwd_int8_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref,
    y_ref, *, heads: int, dim: int, scale: float, scaling: float, eps: float,
):
    mask = mask_ref[:] * jnp.float32(LOG2E)
    refs = _load_int8_refs(
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
        wo_ref, bo_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
        aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref)
    for gidx in range(x_ref.shape[0]):
        y, _ = _int8_block_fwd_stage(
            x_ref[gidx], mask, refs, heads=heads, dim=dim, scale=scale,
            scaling=scaling, eps=eps, keep=False)
        y_ref[gidx] = y.astype(y_ref.dtype)


def _text_block_bwd_int8_kernel(
    x_ref, dy_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref,
    dx_ref, daoA_ref, daoB_ref, dafA_ref, dafB_ref, dapA_ref, dapB_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
):
    width = heads * dim
    cdt = x_ref.dtype
    prec = _mm_prec(cdt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        daoA_ref[:] = jnp.zeros_like(daoA_ref)
        daoB_ref[:] = jnp.zeros_like(daoB_ref)
        dafA_ref[:] = jnp.zeros_like(dafA_ref)
        dafB_ref[:] = jnp.zeros_like(dafB_ref)
        dapA_ref[:] = jnp.zeros_like(dapA_ref)
        dapB_ref[:] = jnp.zeros_like(dapB_ref)

    mask = mask_ref[:] * jnp.float32(LOG2E)
    refs = _load_int8_refs(
        ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
        wo_ref, bo_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
        aoA_ref, aoB_ref, afA_ref, afB_ref, apA_ref, apB_ref)
    (ln1s, _ln1b, ln2s, _ln2b, wqkv_q, sqkv, _bqkv, wo, _bo,
     w1q, s1, _b1, w2q, s2, _b2, aoA, aoB, afA, afB, apA, apB) = refs

    def bdot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    for gidx in range(x_ref.shape[0]):
        dy = dy_ref[gidx].astype(jnp.float32)
        _, res = _int8_block_fwd_stage(
            x_ref[gidx], mask, refs, heads=heads, dim=dim, scale=scale,
            scaling=scaling, eps=eps, keep=True)
        (xf, xhat1, inv1, qkv, probs, a, a_ao, _y1, xhat2, inv2,
         h2, h2_af, f, sig, u_c, u_ap) = res

        # ---- MLP half: y = y1 + int8(u @ W2) + b2 + s (u Ap) Bp ----------
        dmo = dy
        t_p = bdot(dmo, apB, ((1,), (1,)))
        # STE cotangent through the int8 c_proj: dy @ (W2q*s2)^T ==
        # rowquant(dy*s2) @ W2q^T (contract both dim-1s) * rowscale
        du_acc, dms = _q_dot(dmo * s2, w2q, ((1,), (1,)))
        du = du_acc * dms + scaling * bdot(t_p, apA, ((1,), (1,)))
        dapA_ref[:] += scaling * bdot(u_c, t_p, ((0,), (0,)))
        dapB_ref[:] += scaling * bdot(u_ap, dmo, ((0,), (0,)))

        dfq = du * (sig + 1.702 * f * sig * (1.0 - sig))
        t_f = bdot(dfq, afB, ((1,), (1,)))
        dh_acc, dfs = _q_dot(dfq * s1, w1q, ((1,), (1,)))
        dh2 = dh_acc * dfs + scaling * bdot(t_f, afA, ((1,), (1,)))
        dafA_ref[:] += scaling * bdot(h2, t_f, ((0,), (0,)))
        dafB_ref[:] += scaling * bdot(h2_af, dfq, ((0,), (0,)))

        dy1 = dy + _ln_bwd(dh2, xhat2, inv2, ln2s)

        # ---- attention half (out proj is bf16, as in serving) ------------
        dao = dy1
        t_o = bdot(dao, aoB, ((1,), (1,)))
        da = bdot(dao, wo, ((1,), (1,))) + scaling * bdot(t_o, aoA, ((1,), (1,)))
        daoA_ref[:] += scaling * bdot(a, t_o, ((0,), (0,)))
        daoB_ref[:] += scaling * bdot(a_ao, dao, ((0,), (0,)))

        dqs, dks, dvs = [], [], []
        for hd in range(heads):
            p = probs[hd]
            q = qkv[:, hd * dim:(hd + 1) * dim]
            k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
            v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
            gh = da[:, hd * dim:(hd + 1) * dim]
            dv = bdot(p, gh, ((0,), (0,)))
            dp = bdot(gh, v, ((1,), (1,)))
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = ds * scale
            dqs.append(bdot(ds, k, ((1,), (0,))))
            dks.append(bdot(ds, q, ((0,), (0,))))
            dvs.append(dv)
        dqkv = jnp.concatenate(
            [jnp.concatenate(dqs, axis=-1),
             jnp.concatenate(dks, axis=-1),
             jnp.concatenate(dvs, axis=-1)], axis=-1)  # (S, 3W) fp32

        dqkv_acc, dqs_scale = _q_dot(dqkv * sqkv, wqkv_q, ((1,), (1,)))
        dh1 = dqkv_acc * dqs_scale
        dx = dy1 + _ln_bwd(dh1, xhat1, inv1, ln1s)
        dx_ref[gidx] = dx.astype(dx_ref.dtype)


def _int8_weight_operands(bp: Params, qw: QWeights, lora: Params, cdt):
    def row(v):
        return v.reshape(1, -1)

    return (
        row(bp["ln1"]["scale"]).astype(cdt), row(bp["ln1"]["bias"]).astype(cdt),
        row(bp["ln2"]["scale"]).astype(cdt), row(bp["ln2"]["bias"]).astype(cdt),
        qw["wqkv_q"], row(qw["sqkv"]),
        row(bp["attn"]["bqkv"]).astype(cdt),
        bp["attn"]["wo"].astype(cdt), row(bp["attn"]["bo"]).astype(cdt),
        qw["w1_q"], row(qw["s1"]), row(bp["mlp"]["b1"]).astype(cdt),
        qw["w2_q"], row(qw["s2"]), row(bp["mlp"]["b2"]).astype(cdt),
        lora["out_proj"]["A"].astype(cdt), lora["out_proj"]["B"].astype(cdt),
        lora["c_fc"]["A"].astype(cdt), lora["c_fc"]["B"].astype(cdt),
        lora["c_proj"]["A"].astype(cdt), lora["c_proj"]["B"].astype(cdt),
    )


def _int8_weight_specs(width: int, mlp: int, r_o: int, r_f: int, r_p: int):
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return [
        full((1, width)), full((1, width)), full((1, width)), full((1, width)),
        full((width, 3 * width)), full((1, 3 * width)), full((1, 3 * width)),
        full((width, width)), full((1, width)),
        full((width, mlp)), full((1, mlp)), full((1, mlp)),
        full((mlp, width)), full((1, width)), full((1, width)),
        full((width, r_o)), full((r_o, width)),
        full((width, r_f)), full((r_f, mlp)),
        full((mlp, r_p)), full((r_p, width)),
    ]


def _int8_text_block_vmem_bytes(group: int, seq: int, width: int,
                                mlp_dim: int, heads: int) -> int:
    """Same accounting as _text_block_vmem_bytes but with int8 backbone
    weights (wo stays bf16) and the extra int8 quant slabs."""
    rows = group * seq
    weights = (3 * width * width + 2 * width * mlp_dim) + 2 * width * width
    return weights + (
        3 * rows * width * 2
        + seq * seq * 4
        + rows * 3 * width * (4 + 2)
        + group * heads * seq * seq * 4
        + 3 * rows * mlp_dim * 4
        + 6 * rows * width * 4
        + rows * (width + mlp_dim)      # int8 quantized activations
    )


# The int8 estimator runs hotter against reality than the bf16 one: the
# measured v5e in-scan Mosaic allocation for the L/14 text geometry at G=1
# (est 13.30 MB) is 17.57 MB — 1.57 MB over the 16 MB ceiling — while the
# shipping ViT-B/16 G=2 config (est 11.23 MB) compiles and trains at
# B=1024. 12.5 MB splits the two measured points; revisit if a geometry
# lands between them (or add a chunked int8 pair like the bf16 kernels').
_INT8_BLOCK_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def text_block_int8_fits(seq: int, width: int, mlp_dim: int,
                         heads: int) -> bool:
    return _int8_text_block_vmem_bytes(1, seq, width, mlp_dim,
                                       heads) <= _INT8_BLOCK_VMEM_BUDGET


def _pick_group_int8(bsz, seq, width, mlp_dim, heads, want=2):
    group = want
    while bsz % group != 0:
        group //= 2
    group = max(group, 1)
    while group > 1 and _int8_text_block_vmem_bytes(
            group, seq, width, mlp_dim, heads) > _INT8_BLOCK_VMEM_BUDGET:
        group //= 2
    if _int8_text_block_vmem_bytes(group, seq, width, mlp_dim,
                                   heads) > _INT8_BLOCK_VMEM_BUDGET:
        raise ValueError(
            f"int8 text block geometry (S={seq}, W={width}, M={mlp_dim}) "
            "exceeds the VMEM budget even at G=1")
    return group


# ---------------------------------------------------------------------------
# hidden-axis-chunked int8 kernels (wide towers — ViT-L/14-class text)
# ---------------------------------------------------------------------------
#
# The unchunked int8 pair cannot compile at W=768/M=3072 (measured 17.57 MB
# in-scan vs the 16 MB scoped-VMEM ceiling), so wide towers stream the MLP
# hidden axis like the bf16 chunked pair — with one extra wrinkle: the
# serving engine's text tower at this geometry runs the UNCHUNKED int8 MLP
# (ops/quant._mlp_plan resolves ('full', 2, 1) at S=77), whose c_proj
# activation quantization is per-row over the FULL hidden axis. To keep the
# forward in serving numerics, the chunked forward runs a TWO-PASS grid
# (batch groups, 2C): pass 1 streams W1 chunks and materializes the full
# gelu slab u in scratch, the global per-row quantization happens once at
# the pass boundary, and pass 2 streams W2 chunks accumulating the int8
# c_proj partials in an int32 scratch (integer adds are associative, so the
# accumulator equals the unchunked MAC bit-for-bit; the only drift vs the
# unchunked kernel is fp32 summation order in the LoRA side terms). The
# BACKWARD is one pass (batch groups, C): the STE cotangent through c_proj
# row-quantizes dy*s2 over the full W axis (exact vs unchunked), while the
# cotangent through c_fc quantizes dfq per (row, chunk) — finer granularity
# than the unchunked kernel's full-M row scale, which is fine for a
# gradient that is already a ~1e-2-relative STE approximation (gated by
# gradient-cosine tests, not bit-exactness).


def _int8_text_block_chunk_vmem_bytes(group: int, seq: int, width: int,
                                      mlp_dim: int, heads: int,
                                      n_chunks: int) -> int:
    """Peak-live estimate for the chunked int8 pair (union of fwd and bwd
    stashes — the two kernels trade the fwd's full-u slab against the bwd's
    probability stash). Calibrate against real in-scan Mosaic reports like
    the bf16 chunked estimator."""
    rows = group * seq
    chunk = mlp_dim // n_chunks
    return (
        3 * width * width + 2 * width * width  # wqkv_q int8 + wo bf16
        + 2 * 2 * width * chunk                # streamed W1/W2 int8, x2 buffers
        + 2 * 3 * rows * width * 2             # x + dy in (buffered) + dx out
        + seq * seq * 4                        # mask
        + rows * 3 * width * (4 + 2)           # qkv fp32 accumulator + stash
        + group * heads * seq * seq * 4        # probabilities stash (bwd)
        + rows * mlp_dim * 5                   # full-u fp32 + uq int8 (fwd)
        + 2 * rows * width * 4                 # y1 acc + acc2/xhat2 fp32
        + 2 * rows * width * (1 + 2)           # h2q int8 + h2/a stashes
        + 2 * rows * width * 4                 # dh2 + dy-f32 transients
        + 5 * rows * chunk * 4                 # f/sig/u/du/dfq transients
        + 2 * 64 * mlp_dim * 4                 # dafB/dapA full fp32 outputs
        + (1 << 20)                            # lora factors + small stashes
    )


def text_block_int8_plan(seq: int, width: int, mlp_dim: int, heads: int,
                         bsz: int | None = None):
    """(group, n_chunks) blocking for the int8 kernel pair, or None.
    Unchunked preferred (it is the serving composition verbatim); chunk
    sizes must be lane-aligned (M/C % 128 == 0)."""
    for g in (2, 1):
        if bsz is not None and bsz % g:
            continue
        if _int8_text_block_vmem_bytes(g, seq, width, mlp_dim,
                                       heads) <= _INT8_BLOCK_VMEM_BUDGET:
            return (g, 1)
        for c in range(2, mlp_dim // 128 + 1):
            if mlp_dim % c or (mlp_dim // c) % 128:
                continue
            if _int8_text_block_chunk_vmem_bytes(
                    g, seq, width, mlp_dim, heads,
                    c) <= _INT8_BLOCK_VMEM_BUDGET:
                return (g, c)
    return None


def text_block_int8_supported(seq: int, width: int, mlp_dim: int,
                              heads: int) -> bool:
    """True when SOME int8 blocking (unchunked or chunked) fits — the
    trainer's quantize_text gate."""
    return text_block_int8_plan(seq, width, mlp_dim, heads) is not None


def _resolve_plan_int8(bsz, seq, width, mlp, heads, force_plan):
    if force_plan is not None:
        group, n_chunks = force_plan
    else:
        plan = text_block_int8_plan(seq, width, mlp, heads, bsz=bsz)
        if plan is None:
            raise ValueError(
                f"int8 text block geometry (S={seq}, W={width}, M={mlp}) "
                "exceeds the VMEM budget even hidden-axis-chunked at G=1")
        group, n_chunks = plan
    while bsz % group:
        group //= 2
    return max(group, 1), n_chunks


def _int8_chunked_weight_operands(bp: Params, qw: QWeights, lora: Params,
                                  cdt, *, with_b2: bool):
    row = lambda v: v.reshape(1, -1)
    ops = [
        row(bp["ln1"]["scale"]).astype(cdt), row(bp["ln1"]["bias"]).astype(cdt),
        row(bp["ln2"]["scale"]).astype(cdt), row(bp["ln2"]["bias"]).astype(cdt),
        qw["wqkv_q"], row(qw["sqkv"]),
        row(bp["attn"]["bqkv"]).astype(cdt),
        bp["attn"]["wo"].astype(cdt), row(bp["attn"]["bo"]).astype(cdt),
        qw["w1_q"], row(qw["s1"]), row(bp["mlp"]["b1"]).astype(cdt),
        qw["w2_q"], row(qw["s2"]),
    ]
    if with_b2:
        ops.append(row(bp["mlp"]["b2"]).astype(cdt))
    ops += [
        lora["out_proj"]["A"].astype(cdt), lora["out_proj"]["B"].astype(cdt),
        lora["c_fc"]["A"].astype(cdt), lora["c_fc"]["B"].astype(cdt),
        lora["c_proj"]["A"].astype(cdt), lora["c_proj"]["B"].astype(cdt),
    ]
    return ops


def _int8_chunked_weight_specs(width: int, mlp: int, chunk: int,
                               r_o: int, r_f: int, r_p: int, n_chunks: int,
                               *, with_b2: bool):
    """Chunk-sliced specs for the int8 kernels. Index maps use ``c %
    n_chunks`` so the same builder serves the forward's two-pass grid
    (2C steps — pass 2's step c fetches chunk c-C) and the backward's
    one-pass grid (C steps — identity)."""
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    cmod = lambda c: c % n_chunks
    specs = [
        const((1, width)), const((1, width)), const((1, width)), const((1, width)),
        const((width, 3 * width)), const((1, 3 * width)), const((1, 3 * width)),
        const((width, width)), const((1, width)),
        pl.BlockSpec((width, chunk), lambda b, c: (0, cmod(c)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda b, c: (0, cmod(c)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda b, c: (0, cmod(c)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, width), lambda b, c: (cmod(c), 0),
                     memory_space=pltpu.VMEM),
        const((1, width)),
    ]
    if with_b2:
        specs.append(const((1, width)))
    specs += [
        const((width, r_o)), const((r_o, width)),
        const((width, r_f)),
        pl.BlockSpec((r_f, chunk), lambda b, c: (0, cmod(c)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, r_p), lambda b, c: (cmod(c), 0),
                     memory_space=pltpu.VMEM),
        const((r_p, width)),
    ]
    return specs


def _text_block_fwd_int8_chunk_kernel(
    x_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1c_ref, s1c_ref, b1c_ref, w2c_ref, s2_ref, b2_ref,
    aoA_ref, aoB_ref, afA_ref, afBc_ref, apAc_ref, apB_ref,
    y_ref,
    y1_ref, acc2_ref, u_ref, uq_ref, us_ref, h2q_ref, h2s_ref,
    h2af_ref, uap_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
    n_chunks: int, chunk: int,
):
    """Two-pass hidden-axis-chunked int8 whole-block FORWARD: grid
    (batch groups, 2C). Pass 1 (c < C) streams W1 chunks and fills the full
    gelu slab ``u``; the pass boundary quantizes u per-row over the FULL
    hidden axis (serving numerics — the serving text MLP at these
    geometries is the unchunked kernel); pass 2 streams W2 chunks and
    accumulates the int8 c_proj partials in int32 (bit-equal to the
    unchunked MAC)."""
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)
    cdt = x_ref.dtype
    group, seq, _ = x_ref.shape
    rows = group * seq
    c = pl.program_id(1)

    def bdot(a, b, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(c == 0)
    def _stage_attention_half():
        mask = mask_ref[:] * jnp.float32(LOG2E)
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        ln2b = ln2b_ref[:].astype(jnp.float32)
        sqkv = sqkv_ref[:].astype(jnp.float32)
        bqkv = bqkv_ref[:].astype(jnp.float32)
        bo = bo_ref[:].astype(jnp.float32)
        for gidx in range(group):
            xf = x_ref[gidx].astype(jnp.float32)
            h1f, _, _ = _ln_fwd(xf, ln1s, ln1b, eps)
            acc, hs = _q_dot(h1f, wqkv_ref[:], ((1,), (0,)))
            qkv = (acc * hs * sqkv + bqkv).astype(cdt)
            outs = []
            for hd in range(heads):
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                qs = q * jnp.asarray(scale * LOG2E, cdt)
                s = bdot(qs, k, ((1,), (1,)))
                p = exp2_rows(s + mask)
                p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
                outs.append(bdot(p, v, ((1,), (0,))).astype(cdt))
            a = jnp.concatenate(outs, axis=-1)
            a_ao = bdot(a, aoA_ref[:], ((1,), (0,)))
            ao = (bdot(a, wo_ref[:], ((1,), (0,))) + bo
                  + scaling * bdot(a_ao, aoB_ref[:], ((1,), (0,))))
            y1 = xf + ao
            h2f, _, _ = _ln_fwd(y1, ln2s, ln2b, eps)
            hq, hscale = _row_quant(h2f)
            sl = slice(gidx * seq, (gidx + 1) * seq)
            y1_ref[sl] = y1
            h2q_ref[sl] = hq
            h2s_ref[sl] = hscale
            h2af_ref[sl] = bdot(h2f.astype(cdt), afA_ref[:], ((1,), (0,)))
        uap_ref[:] = jnp.zeros_like(uap_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(c < n_chunks)
    def _pass1():
        acc1 = jax.lax.dot_general(
            h2q_ref[:], w1c_ref[:], dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT).astype(jnp.float32)
        f = (acc1 * h2s_ref[:] * s1c_ref[:].astype(jnp.float32)
             + b1c_ref[:].astype(jnp.float32)
             + scaling * bdot(h2af_ref[:], afBc_ref[:], ((1,), (0,))))
        u, _sig = _qgelu_fwd(f)
        u_ref[:, pl.dslice(c * chunk, chunk)] = u
        uap_ref[:] += bdot(u.astype(cdt), apAc_ref[:], ((1,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _quantize_u():
        uq, us = _row_quant(u_ref[:])
        uq_ref[:] = uq
        us_ref[:] = us

    @pl.when(c >= n_chunks)
    def _pass2():
        cidx = c - n_chunks
        acc2_ref[:] += jax.lax.dot_general(
            uq_ref[:, pl.dslice(cidx * chunk, chunk)], w2c_ref[:],
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)

    @pl.when(c == 2 * n_chunks - 1)
    def _emit():
        mo = (acc2_ref[:].astype(jnp.float32) * us_ref[:]
              * s2_ref[:].astype(jnp.float32)
              + b2_ref[:].astype(jnp.float32)
              + scaling * bdot(uap_ref[:], apB_ref[:], ((1,), (0,))))
        y = y1_ref[:] + mo
        y_ref[:] = y.reshape(group, seq, width).astype(y_ref.dtype)


def _text_block_bwd_int8_chunk_kernel(
    x_ref, dy_ref, mask_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, bo_ref,
    w1c_ref, s1c_ref, b1c_ref, w2c_ref, s2_ref,
    aoA_ref, aoB_ref, afA_ref, afBc_ref, apAc_ref, apB_ref,
    dx_ref, daoA_ref, daoB_ref, dafA_ref, dafB_ref, dapA_ref, dapB_ref,
    qkv_ref, probs_ref, a_ref, aao_ref, xhat2_ref, inv2_ref,
    h2_ref, h2q_ref, h2s_ref, h2af_ref, tp_ref, tf_ref, uap_ref, dh2_ref,
    *, heads: int, dim: int, scale: float, scaling: float, eps: float,
    n_chunks: int, chunk: int,
):
    """Hidden-axis-chunked int8 whole-block BACKWARD: grid (batch groups,
    chunks). Chunk 0 recomputes the int8 attention half (serving numerics)
    and stashes what the close needs; every chunk recomputes its f/gelu
    slab from the stashed h2 quantization (bit-equal to the forward's) and
    accumulates the backbone and LoRA partials. The STE cotangent through
    c_proj row-quantizes dy*s2 over the full W axis (exact vs unchunked);
    the c_fc cotangent quantizes per (row, chunk)."""
    width = heads * dim
    prec = _mm_prec(x_ref.dtype)
    cdt = x_ref.dtype
    group, seq, _ = x_ref.shape
    rows = group * seq
    b = pl.program_id(0)
    c = pl.program_id(1)

    def bdot(a, b_, contract):
        return jax.lax.dot_general(
            a.astype(cdt), b_.astype(cdt), dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _zero_lora_grads():
        daoA_ref[:] = jnp.zeros_like(daoA_ref)
        daoB_ref[:] = jnp.zeros_like(daoB_ref)
        dafA_ref[:] = jnp.zeros_like(dafA_ref)
        dafB_ref[:] = jnp.zeros_like(dafB_ref)
        dapA_ref[:] = jnp.zeros_like(dapA_ref)
        dapB_ref[:] = jnp.zeros_like(dapB_ref)

    dy = dy_ref[:].reshape(rows, width).astype(jnp.float32)
    s1c = s1c_ref[:].astype(jnp.float32)
    s2 = s2_ref[:].astype(jnp.float32)

    @pl.when(c == 0)
    def _stage_attention_half():
        mask = mask_ref[:] * jnp.float32(LOG2E)
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        ln2b = ln2b_ref[:].astype(jnp.float32)
        sqkv = sqkv_ref[:].astype(jnp.float32)
        bqkv = bqkv_ref[:].astype(jnp.float32)
        bo = bo_ref[:].astype(jnp.float32)
        for gidx in range(group):
            xf = x_ref[gidx].astype(jnp.float32)
            h1f, _, _ = _ln_fwd(xf, ln1s, ln1b, eps)
            acc, hs = _q_dot(h1f, wqkv_ref[:], ((1,), (0,)))
            qkv = (acc * hs * sqkv + bqkv).astype(cdt)
            qkv_ref[gidx] = qkv
            outs = []
            for hd in range(heads):
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                qs = q * jnp.asarray(scale * LOG2E, cdt)
                s = bdot(qs, k, ((1,), (1,)))
                p = exp2_rows(s + mask)
                p = p * (1.0 / _denom_guard(jnp.sum(p, axis=-1, keepdims=True)))
                probs_ref[gidx, hd] = p
                outs.append(bdot(p, v, ((1,), (0,))).astype(cdt))
            a_ref[gidx] = jnp.concatenate(outs, axis=-1)
        a = a_ref[:].reshape(rows, width)
        aao_ref[:] = bdot(a, aoA_ref[:], ((1,), (0,)))
        xf = x_ref[:].reshape(rows, width).astype(jnp.float32)
        ao = (bdot(a, wo_ref[:], ((1,), (0,))) + bo
              + scaling * bdot(aao_ref[:], aoB_ref[:], ((1,), (0,))))
        y1 = xf + ao
        h2f, xhat2, inv2 = _ln_fwd(y1, ln2s, ln2b, eps)
        xhat2_ref[:] = xhat2
        inv2_ref[:] = inv2
        h2_ref[:] = h2f.astype(cdt)
        hq, hscale = _row_quant(h2f)
        h2q_ref[:] = hq
        h2s_ref[:] = hscale
        h2af_ref[:] = bdot(h2f.astype(cdt), afA_ref[:], ((1,), (0,)))
        tp_ref[:] = bdot(dy, apB_ref[:], ((1,), (1,)))
        tf_ref[:] = jnp.zeros_like(tf_ref)
        uap_ref[:] = jnp.zeros_like(uap_ref)
        dh2_ref[:] = jnp.zeros_like(dh2_ref)

    # ---- per-chunk MLP backward (f/gelu recomputed bit-equal per chunk) ---
    acc1 = jax.lax.dot_general(
        h2q_ref[:], w1c_ref[:], dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT).astype(jnp.float32)
    f = (acc1 * h2s_ref[:] * s1c
         + b1c_ref[:].astype(jnp.float32)
         + scaling * bdot(h2af_ref[:], afBc_ref[:], ((1,), (0,))))
    u, sig = _qgelu_fwd(f)
    u_c = u.astype(cdt)
    du_acc, dms = _q_dot(dy * s2, w2c_ref[:], ((1,), (1,)))
    du = du_acc * dms + scaling * bdot(tp_ref[:], apAc_ref[:], ((1,), (1,)))
    dfq = du * (sig + 1.702 * f * sig * (1.0 - sig))
    dh_acc, dfs = _q_dot(dfq * s1c, w1c_ref[:], ((1,), (1,)))
    dh2_ref[:] += dh_acc * dfs
    tf_ref[:] += bdot(dfq, afBc_ref[:], ((1,), (1,)))
    uap_ref[:] += bdot(u_c, apAc_ref[:], ((1,), (0,)))
    dafB_ref[:, pl.dslice(c * chunk, chunk)] += scaling * bdot(
        h2af_ref[:], dfq, ((0,), (0,)))
    dapA_ref[pl.dslice(c * chunk, chunk), :] += scaling * bdot(
        u_c, tp_ref[:], ((0,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _close():
        ln1s = ln1s_ref[:].astype(jnp.float32)
        ln1b = ln1b_ref[:].astype(jnp.float32)
        ln2s = ln2s_ref[:].astype(jnp.float32)
        sqkv = sqkv_ref[:].astype(jnp.float32)
        dh2 = dh2_ref[:] + scaling * bdot(tf_ref[:], afA_ref[:], ((1,), (1,)))
        dafA_ref[:] += scaling * bdot(h2_ref[:], tf_ref[:], ((0,), (0,)))
        dapB_ref[:] += scaling * bdot(uap_ref[:], dy, ((0,), (0,)))
        dy1 = dy + _ln_bwd(dh2, xhat2_ref[:], inv2_ref[:], ln2s)

        dao = dy1
        t_o = bdot(dao, aoB_ref[:], ((1,), (1,)))
        da = (bdot(dao, wo_ref[:], ((1,), (1,)))
              + scaling * bdot(t_o, aoA_ref[:], ((1,), (1,))))
        a = a_ref[:].reshape(rows, width)
        daoA_ref[:] += scaling * bdot(a, t_o, ((0,), (0,)))
        daoB_ref[:] += scaling * bdot(aao_ref[:], dao, ((0,), (0,)))

        for gidx in range(group):
            qkv = qkv_ref[gidx]
            dqs, dks, dvs = [], [], []
            for hd in range(heads):
                p = probs_ref[gidx, hd]
                q = qkv[:, hd * dim:(hd + 1) * dim]
                k = qkv[:, width + hd * dim: width + (hd + 1) * dim]
                v = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                gh = da[gidx * seq:(gidx + 1) * seq, hd * dim:(hd + 1) * dim]
                dv = bdot(p, gh, ((0,), (0,)))
                dp = bdot(gh, v, ((1,), (1,)))
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds = ds * scale
                dqs.append(bdot(ds, k, ((1,), (0,))))
                dks.append(bdot(ds, q, ((0,), (0,))))
                dvs.append(dv)
            dqkv = jnp.concatenate(
                [jnp.concatenate(dqs, axis=-1),
                 jnp.concatenate(dks, axis=-1),
                 jnp.concatenate(dvs, axis=-1)], axis=-1)  # (S, 3W) fp32
            dqkv_acc, dqs_scale = _q_dot(dqkv * sqkv, wqkv_ref[:], ((1,), (1,)))
            dh1 = dqkv_acc * dqs_scale
            xf = x_ref[gidx].astype(jnp.float32)
            _, xhat1, inv1 = _ln_fwd(xf, ln1s, ln1b, eps)
            dx = dy1[gidx * seq:(gidx + 1) * seq] + _ln_bwd(dh1, xhat1, inv1, ln1s)
            dx_ref[gidx] = dx.astype(dx_ref.dtype)


def text_block_fwd_int8(
    x: jnp.ndarray, mask: jnp.ndarray, bp: Params, qw: QWeights,
    lora: Params, *, heads: int, scaling: float, eps: float = 1e-5,
    interpret: bool = False,
    force_plan: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    bsz, seq, width = x.shape
    dim = width // heads
    mlp = qw["w1_q"].shape[-1]
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    group, n_chunks = _resolve_plan_int8(bsz, seq, width, mlp, heads,
                                         force_plan)
    if n_chunks > 1:
        chunk = mlp // n_chunks
        rows = group * seq
        return pl.pallas_call(
            functools.partial(_text_block_fwd_int8_chunk_kernel, heads=heads,
                              dim=dim, scale=dim ** -0.5, scaling=scaling,
                              eps=eps, n_chunks=n_chunks, chunk=chunk),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group, 2 * n_chunks),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((seq, seq), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM),
                *_int8_chunked_weight_specs(width, mlp, chunk, r_o, r_f, r_p,
                                            n_chunks, with_b2=True),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, width), jnp.float32),   # y1
                pltpu.VMEM((rows, width), jnp.int32),     # acc2
                pltpu.VMEM((rows, mlp), jnp.float32),     # full u slab
                pltpu.VMEM((rows, mlp), jnp.int8),        # uq
                pltpu.VMEM((rows, 1), jnp.float32),       # us
                pltpu.VMEM((rows, width), jnp.int8),      # h2q
                pltpu.VMEM((rows, 1), jnp.float32),       # h2s
                pltpu.VMEM((rows, r_f), jnp.float32),     # h2 @ Af
                pltpu.VMEM((rows, r_p), jnp.float32),     # u @ Ap accumulator
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * seq * width * (4 * width + 2 * mlp)
                + 4 * bsz * heads * seq * seq * dim,
                bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
                + (bsz // group) * (3 * width * width + 2 * width * mlp),
                transcendentals=bsz * (heads * seq * seq + seq * mlp),
            ),
            interpret=interpret,
        )(x, mask.astype(jnp.float32),
          *_int8_chunked_weight_operands(bp, qw, lora, x.dtype, with_b2=True))

    return pl.pallas_call(
        functools.partial(_text_block_fwd_int8_kernel, heads=heads, dim=dim,
                          scale=dim ** -0.5, scaling=scaling, eps=eps),
        out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
            *_int8_weight_specs(width, mlp, r_o, r_f, r_p),
        ],
        out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 4 * bsz * heads * seq * seq * dim,
            bytes_accessed=2 * bsz * seq * width * x.dtype.itemsize
            + 3 * width * width + 2 * width * mlp,
            transcendentals=bsz * (heads * seq * seq + seq * mlp),
        ),
        interpret=interpret,
    )(x, mask.astype(jnp.float32), *_int8_weight_operands(bp, qw, lora, x.dtype))


def _text_block_bwd_int8_chunked(
    x, dy, mask, bp, qw, lora, *, group: int, n_chunks: int, heads: int,
    dim: int, scaling: float, eps: float, interpret: bool,
) -> Tuple[jnp.ndarray, Params]:
    bsz, seq, width = x.shape
    mlp = qw["w1_q"].shape[-1]
    chunk = mlp // n_chunks
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    cdt = x.dtype
    rows = group * seq

    out_shapes = (
        jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        jax.ShapeDtypeStruct((width, r_o), jnp.float32),
        jax.ShapeDtypeStruct((r_o, width), jnp.float32),
        jax.ShapeDtypeStruct((width, r_f), jnp.float32),
        jax.ShapeDtypeStruct((r_f, mlp), jnp.float32),
        jax.ShapeDtypeStruct((mlp, r_p), jnp.float32),
        jax.ShapeDtypeStruct((r_p, width), jnp.float32),
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_text_block_bwd_int8_chunk_kernel, heads=heads,
                          dim=dim, scale=dim ** -0.5, scaling=scaling,
                          eps=eps, n_chunks=n_chunks, chunk=chunk),
        out_shape=out_shapes,
        grid=(bsz // group, n_chunks),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            *_int8_chunked_weight_specs(width, mlp, chunk, r_o, r_f, r_p,
                                        n_chunks, with_b2=False),
        ],
        out_specs=(
            pl.BlockSpec((group, seq, width), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((width, r_o)), const((r_o, width)),
            const((width, r_f)), const((r_f, mlp)),
            const((mlp, r_p)), const((r_p, width)),
        ),
        scratch_shapes=[
            pltpu.VMEM((group, seq, 3 * width), cdt),          # qkv
            pltpu.VMEM((group, heads, seq, seq), jnp.float32),  # probabilities
            pltpu.VMEM((group, seq, width), cdt),              # a
            pltpu.VMEM((rows, r_o), jnp.float32),              # a @ Ao
            pltpu.VMEM((rows, width), jnp.float32),            # xhat2
            pltpu.VMEM((rows, 1), jnp.float32),                # inv2
            pltpu.VMEM((rows, width), cdt),                    # h2
            pltpu.VMEM((rows, width), jnp.int8),               # h2q
            pltpu.VMEM((rows, 1), jnp.float32),                # h2s
            pltpu.VMEM((rows, r_f), jnp.float32),              # h2 @ Af
            pltpu.VMEM((rows, r_p), jnp.float32),              # dy @ Bp^T
            pltpu.VMEM((rows, r_f), jnp.float32),              # t_f accumulator
            pltpu.VMEM((rows, r_p), jnp.float32),              # u @ Ap accumulator
            pltpu.VMEM((rows, width), jnp.float32),            # dh2 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 6 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * width * x.dtype.itemsize
            + (bsz // group) * (3 * width * width + 2 * width * mlp),
            transcendentals=bsz * (heads * seq * seq + 2 * seq * mlp),
        ),
        interpret=interpret,
    )(x, dy.astype(x.dtype), mask.astype(jnp.float32),
      *_int8_chunked_weight_operands(bp, qw, lora, cdt, with_b2=False))
    dx = outs[0]
    z = lora
    dlora = {
        "out_proj": {"A": outs[1].astype(z["out_proj"]["A"].dtype),
                     "B": outs[2].astype(z["out_proj"]["B"].dtype)},
        "c_fc": {"A": outs[3].astype(z["c_fc"]["A"].dtype),
                 "B": outs[4].astype(z["c_fc"]["B"].dtype)},
        "c_proj": {"A": outs[5].astype(z["c_proj"]["A"].dtype),
                   "B": outs[6].astype(z["c_proj"]["B"].dtype)},
    }
    return dx, dlora


def text_block_bwd_int8(
    x: jnp.ndarray, dy: jnp.ndarray, mask: jnp.ndarray,
    bp: Params, qw: QWeights, lora: Params, *,
    heads: int, scaling: float, eps: float = 1e-5, interpret: bool = False,
    force_plan: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, Params]:
    bsz, seq, width = x.shape
    dim = width // heads
    mlp = qw["w1_q"].shape[-1]
    r_o = lora["out_proj"]["A"].shape[-1]
    r_f = lora["c_fc"]["A"].shape[-1]
    r_p = lora["c_proj"]["A"].shape[-1]
    group, n_chunks = _resolve_plan_int8(bsz, seq, width, mlp, heads,
                                         force_plan)
    if n_chunks > 1:
        return _text_block_bwd_int8_chunked(
            x, dy, mask, bp, qw, lora, group=group, n_chunks=n_chunks,
            heads=heads, dim=dim, scaling=scaling, eps=eps,
            interpret=interpret)

    out_shapes = (
        jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
        jax.ShapeDtypeStruct((width, r_o), jnp.float32),
        jax.ShapeDtypeStruct((r_o, width), jnp.float32),
        jax.ShapeDtypeStruct((width, r_f), jnp.float32),
        jax.ShapeDtypeStruct((r_f, mlp), jnp.float32),
        jax.ShapeDtypeStruct((mlp, r_p), jnp.float32),
        jax.ShapeDtypeStruct((r_p, width), jnp.float32),
    )
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_text_block_bwd_int8_kernel, heads=heads, dim=dim,
                          scale=dim ** -0.5, scaling=scaling, eps=eps),
        out_shape=out_shapes,
        grid=(bsz // group,),
        in_specs=[
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
            *_int8_weight_specs(width, mlp, r_o, r_f, r_p),
        ],
        out_specs=(
            pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full((width, r_o)), full((r_o, width)),
            full((width, r_f)), full((r_f, mlp)),
            full((mlp, r_p)), full((r_p, width)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * bsz * seq * width * (4 * width + 2 * mlp)
            + 6 * 2 * bsz * heads * seq * seq * dim,
            bytes_accessed=4 * bsz * seq * width * x.dtype.itemsize
            + 3 * width * width + 2 * width * mlp,
            transcendentals=bsz * (heads * seq * seq + seq * mlp),
        ),
        interpret=interpret,
    )(x, dy.astype(x.dtype), mask.astype(jnp.float32),
      *_int8_weight_operands(bp, qw, lora, x.dtype))
    dx = outs[0]
    z = lora
    dlora = {
        "out_proj": {"A": outs[1].astype(z["out_proj"]["A"].dtype),
                     "B": outs[2].astype(z["out_proj"]["B"].dtype)},
        "c_fc": {"A": outs[3].astype(z["c_fc"]["A"].dtype),
                 "B": outs[4].astype(z["c_fc"]["B"].dtype)},
        "c_proj": {"A": outs[5].astype(z["c_proj"]["A"].dtype),
                   "B": outs[6].astype(z["c_proj"]["B"].dtype)},
    }
    return dx, dlora


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def text_block_lora_int8(x, bp, qw, lora, mask, heads, scaling,
                         interpret=False):
    """One training text block in the SERVING int8 numerics with a
    hand-written whole-block backward. Differentiable in x and the LoRA
    tree; the int8 backbone weights and scales are constants (frozen).
    Backward uses the straight-through estimator through the activation
    quantization and runs its cotangent matmuls int8 — gradients match the
    bf16-exact path to ~1e-2 relative (gradient-cosine gated in tests)."""
    return text_block_fwd_int8(x, mask, bp, qw, lora, heads=heads,
                               scaling=scaling, interpret=interpret)


def _tbi_fwd(x, bp, qw, lora, mask, heads, scaling, interpret):
    y = text_block_fwd_int8(x, mask, bp, qw, lora, heads=heads,
                            scaling=scaling, interpret=interpret)
    return y, (x, bp, qw, lora, mask)


def _tbi_bwd(heads, scaling, interpret, res, dy):
    import numpy as _np

    x, bp, qw, lora, mask = res
    dx, dlora = text_block_bwd_int8(
        x, dy, mask, bp, qw, lora,
        heads=heads, scaling=scaling, interpret=interpret,
    )
    dbp = jax.tree.map(jnp.zeros_like, bp)
    # int8 weight leaves are integer primals: their cotangent dtype is float0
    dqw = jax.tree.map(
        lambda v: (_np.zeros(v.shape, jax.dtypes.float0)
                   if jnp.issubdtype(v.dtype, jnp.integer)
                   else jnp.zeros_like(v)),
        qw)
    return dx, dbp, dqw, dlora, jnp.zeros_like(mask)


text_block_lora_int8.defvjp(_tbi_fwd, _tbi_bwd)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def text_block_lora(x, bp, lora, mask, heads, scaling, interpret=False):
    """One training text block with a HAND-WRITTEN whole-block backward.

    Differentiable in x and the LoRA tree (out_proj/c_fc/c_proj all
    required); backbone params receive zero cotangents (they are frozen by
    construction in the trainer — the zeros are dead code XLA removes).
    ``mask`` must be a concrete (S, S) additive array.
    """
    return text_block_fwd(x, mask, bp, lora, heads=heads, scaling=scaling,
                          interpret=interpret)


def _tb_fwd(x, bp, lora, mask, heads, scaling, interpret):
    y = text_block_fwd(x, mask, bp, lora, heads=heads, scaling=scaling,
                       interpret=interpret)
    return y, (x, bp, lora, mask)


def _tb_bwd(heads, scaling, interpret, res, dy):
    x, bp, lora, mask = res
    dx, dlora = text_block_bwd(
        x, dy, mask, bp, lora,
        heads=heads, scaling=scaling, interpret=interpret,
    )
    dbp = jax.tree.map(jnp.zeros_like, bp)  # frozen backbone: DCE'd
    return dx, dbp, dlora, jnp.zeros_like(mask)


text_block_lora.defvjp(_tb_fwd, _tb_bwd)
