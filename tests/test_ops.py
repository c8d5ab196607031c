"""Ops tests: Pallas attention kernel (interpreter mode) vs XLA reference,
device-preprocess fused path vs the host numpy path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiic_tpu.models.clip import attention, causal_mask
from aiic_tpu.ops.attention import fused_attention


def _xla_attention(q, k, v, mask):
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if mask is not None:
        scores = scores + mask
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("seq,heads,dim,use_mask", [
    (197, 12, 64, False),   # ViT tower geometry
    (77, 8, 64, True),      # text tower geometry (causal)
    (16, 4, 8, True),       # tiny, heavy padding in both dims
])
def test_pallas_attention_matches_xla(seq, heads, dim, use_mask):
    rng = np.random.default_rng(0)
    b = 2
    q = jnp.asarray(rng.standard_normal((b, seq, heads, dim)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, seq, heads, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, seq, heads, dim)).astype(np.float32))
    mask = causal_mask(seq) if use_mask else None

    ref = np.asarray(_xla_attention(q, k, v, mask))
    out = np.asarray(fused_attention(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("seq,heads,dim,use_mask", [
    (197, 12, 64, False),
    (77, 8, 64, True),
])
def test_transpose_free_qkv_kernel_matches_xla(seq, heads, dim, use_mask):
    from aiic_tpu.ops.attention import fused_attention_qkv

    rng = np.random.default_rng(7)
    b = 2
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3, heads, dim)).astype(np.float32))
    mask = causal_mask(seq) if use_mask else None
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = np.asarray(_xla_attention(q, k, v, mask)).reshape(b, seq, heads * dim)
    out = np.asarray(fused_attention_qkv(qkv, mask, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pallas_attention_inside_model_block():
    """attn_impl='pallas' must be drop-in for the whole tower."""
    from aiic_tpu.models import TINY_TEST, encode_text, init_clip_params

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    tok = np.zeros((2, TINY_TEST.context_length), np.int32)
    tok[:, 0] = TINY_TEST.vocab_size - 2
    tok[:, 5] = TINY_TEST.vocab_size - 1
    a = encode_text(params, jnp.asarray(tok), TINY_TEST, attn_impl="xla")
    b = encode_text(params, jnp.asarray(tok), TINY_TEST, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_device_preprocess_fixed_matches_host():
    from aiic_tpu.data.preprocess import preprocess_numpy
    from aiic_tpu.ops.preprocess import device_preprocess_fixed, make_resize_mats

    rng = np.random.default_rng(3)
    h, w = 300, 400
    imgs = rng.integers(0, 256, (3, h, w, 3), dtype=np.uint8)
    ky, kx, top, left = make_resize_mats(h, w, 224)
    dev = np.asarray(
        device_preprocess_fixed(
            jnp.asarray(imgs), jnp.asarray(ky), jnp.asarray(kx), top, left, 224
        )
    )
    host = np.stack([preprocess_numpy(im, 224) for im in imgs])
    # fp32 rounding ties may flip a pixel by one uint8 level, nothing more
    from aiic_tpu.data.preprocess import CLIP_STD

    level = (1.0 / 255.0) / CLIP_STD.min()
    diff = np.abs(dev - host)
    assert diff.max() <= level * 1.01
    assert (diff > 1e-4).mean() < 1e-4


def test_normalize_u8_matches_reference_formula():
    from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
    from aiic_tpu.ops.preprocess import normalize_u8

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(x)))
    ref = ((x.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fused_ln_mlp_matches_xla_math():
    from aiic_tpu.ops.mlp import fused_ln_mlp

    rng = np.random.default_rng(0)
    b, s, w, m = 2, 16, 32, 128
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal((w,)).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal((w,)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal((m,)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((w,)).astype(np.float32))

    out = np.asarray(fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, interpret=True))

    from aiic_tpu.models.clip import layer_norm, quick_gelu

    h = layer_norm(x, {"scale": ln_s, "bias": ln_b})
    h = quick_gelu(h @ w1 + b1)
    ref = np.asarray(x + (h @ w2 + b2))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_fused_mlp_active_in_bf16_pallas_block():
    """bf16 + pallas block output must match the XLA block closely."""
    from aiic_tpu.models import TINY_TEST, init_clip_params
    from aiic_tpu.models.clip import block

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    b0 = jax.tree.map(lambda a: a[0].astype(jnp.bfloat16), params["text"]["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, TINY_TEST.context_length, TINY_TEST.text.width), jnp.bfloat16)
    a = block(x, b0, TINY_TEST.text.heads, None, "quick_gelu", attn_impl="xla")
    c = block(x, b0, TINY_TEST.text.heads, None, "quick_gelu", attn_impl="pallas_mlp")
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(c, np.float32), atol=0.05, rtol=0.05
    )


@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_ln_qkv_attention_matches_xla(use_mask):
    """Whole attention half-block kernel vs the composed XLA ops."""
    from aiic_tpu.models.clip import attention as xla_attention
    from aiic_tpu.models.clip import layer_norm
    from aiic_tpu.ops.attention import fused_ln_qkv_attention

    rng = np.random.default_rng(11)
    b, s, w, h = 2, 77, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    p = {
        "ln1": {"scale": jnp.asarray(rng.standard_normal(w).astype(np.float32)),
                "bias": jnp.asarray(rng.standard_normal(w).astype(np.float32))},
        "attn": {
            "wqkv": jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32)),
            "bqkv": jnp.asarray(rng.standard_normal(3 * w).astype(np.float32)),
            "wo": jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32)),
            "bo": jnp.asarray(rng.standard_normal(w).astype(np.float32)),
        },
    }
    mask = causal_mask(s) if use_mask else None
    ref = x + xla_attention(layer_norm(x, p["ln1"]), p["attn"], h, mask, attn_impl="xla")
    out = fused_ln_qkv_attention(
        x, p["ln1"]["scale"], p["ln1"]["bias"],
        p["attn"]["wqkv"], p["attn"]["bqkv"], p["attn"]["wo"], p["attn"]["bo"],
        mask, heads=h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_int8_mlp_accuracy_vs_fp32():
    """Dynamic-int8 MLP must stay within ~1% relative error of fp32."""
    from aiic_tpu.models.clip import layer_norm, quick_gelu
    from aiic_tpu.ops.quant import int8_ln_mlp, quantize_weight

    rng = np.random.default_rng(0)
    b, s, w, m = 2, 16, 64, 256
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    ln_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.08).astype(np.float32))
    b1 = jnp.asarray((0.1 * rng.standard_normal(m)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.08).astype(np.float32))
    b2 = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))

    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    out = np.asarray(int8_ln_mlp(x, ln_s, ln_b, w1_q, s1, b1, w2_q, s2, b2,
                                 interpret=True))

    h = layer_norm(x, {"scale": ln_s, "bias": ln_b})
    h = quick_gelu(h @ w1 + b1)
    ref = np.asarray(x + (h @ w2 + b2))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.01, rel.mean()
    assert rel.max() < 0.2, rel.max()


def test_quantize_weight_roundtrip_properties():
    from aiic_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 64)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # half an int8 step


def test_quantized_model_tower_close_to_fp(tiny_bf16_tol=0.08):
    """encode_image with quantized MLP weights stays close to the bf16 path
    and is picked up automatically from the params tree."""
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params
    from aiic_tpu.ops.quant import quantize_model_mlp

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    qparams = quantize_model_mlp(params)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (2, TINY_TEST.image_size, TINY_TEST.image_size, 3),
                            jnp.bfloat16)
    base = np.asarray(encode_image(params, px, TINY_TEST, dtype=jnp.bfloat16,
                                   attn_impl="pallas"), np.float32)
    quant = np.asarray(encode_image(qparams, px, TINY_TEST, dtype=jnp.bfloat16,
                                    attn_impl="pallas"), np.float32)
    # cosine similarity per row must stay very high
    cos = (base * quant).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(quant, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos
    # and fp32 path ignores quantized weights entirely
    fp = np.asarray(encode_image(qparams, px.astype(jnp.float32), TINY_TEST))
    fp_ref = np.asarray(encode_image(params, px.astype(jnp.float32), TINY_TEST))
    np.testing.assert_allclose(fp, fp_ref, atol=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_int8_attention_matches_fp32(use_mask):
    """int8-projection attention half-block vs the composed fp32 XLA ops."""
    from aiic_tpu.models.clip import attention as xla_attention
    from aiic_tpu.models.clip import layer_norm
    from aiic_tpu.ops.quant import int8_ln_qkv_attention, quantize_weight

    rng = np.random.default_rng(21)
    b, s, w, h = 2, 77, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    p = {
        "ln1": {"scale": jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32)),
                "bias": jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))},
        "attn": {
            "wqkv": jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32)),
            "bqkv": jnp.asarray((0.1 * rng.standard_normal(3 * w)).astype(np.float32)),
            "wo": jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32)),
            "bo": jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32)),
        },
    }
    mask = causal_mask(s) if use_mask else None
    ref = np.asarray(
        x + xla_attention(layer_norm(x, p["ln1"]), p["attn"], h, mask, attn_impl="xla")
    )
    wqkv_q, sqkv = quantize_weight(p["attn"]["wqkv"])
    out = np.asarray(int8_ln_qkv_attention(
        x, p["ln1"]["scale"], p["ln1"]["bias"],
        wqkv_q, sqkv, p["attn"]["bqkv"], p["attn"]["wo"], p["attn"]["bo"],
        mask, heads=h, interpret=True,
    ))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.01, rel.mean()
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_full_int8_model_tower_close_to_fp():
    """encode_image with quantized MLP + attention projections (the full
    serving quantization) stays >=0.999 cosine vs the bf16 path and is
    picked up automatically from the params tree."""
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params
    from aiic_tpu.ops.quant import quantize_model

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    qparams = quantize_model(params)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (2, TINY_TEST.image_size, TINY_TEST.image_size, 3),
                            jnp.bfloat16)
    base = np.asarray(encode_image(params, px, TINY_TEST, dtype=jnp.bfloat16,
                                   attn_impl="pallas"), np.float32)
    quant = np.asarray(encode_image(qparams, px, TINY_TEST, dtype=jnp.bfloat16,
                                    attn_impl="pallas"), np.float32)
    cos = (base * quant).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(quant, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos
    # fp32 path ignores quantized weights entirely
    fp = np.asarray(encode_image(qparams, px.astype(jnp.float32), TINY_TEST))
    fp_ref = np.asarray(encode_image(params, px.astype(jnp.float32), TINY_TEST))
    np.testing.assert_allclose(fp, fp_ref, atol=1e-5)


def test_int8_mlp_batch6_padded_blocks():
    """B=6, S=197 -> 1182 rows with no power-of-two divisor: must pad to the
    fixed block size rather than one giant block (a 1182-row block's int32
    accumulator alone is 14.5 MB and blows the 16 MB scoped-VMEM budget —
    found by the 150-image parity gate whose last chunk is 6 images)."""
    from aiic_tpu.models.clip import layer_norm, quick_gelu
    from aiic_tpu.ops.quant import int8_ln_mlp, quantize_weight

    rng = np.random.default_rng(3)
    b, s, w, m = 6, 197, 32, 128
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    ln_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.1).astype(np.float32))
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    out = np.asarray(int8_ln_mlp(x, ln_s, ln_b, w1_q, s1, jnp.zeros((m,)),
                                 w2_q, s2, jnp.zeros((w,)), interpret=True))
    assert out.shape == (b, s, w)
    h = layer_norm(x, {"scale": ln_s, "bias": ln_b})
    ref = np.asarray(x + quick_gelu(h @ w1) @ w2)
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.01, rel.mean()


def test_int8_mlp_batch1_odd_rows():
    """B=1, S=197 -> 197 rows (prime): pads to a 200-row sublane-aligned
    block (TPU requires sublane-divisible or full-dim block shapes)."""
    from aiic_tpu.ops.quant import int8_ln_mlp, quantize_weight

    rng = np.random.default_rng(2)
    w, m = 32, 128
    x = jnp.asarray(rng.standard_normal((1, 197, w)).astype(np.float32))
    ln_s = jnp.ones((w,), jnp.float32)
    ln_b = jnp.zeros((w,), jnp.float32)
    w1_q, s1 = quantize_weight(jnp.asarray((rng.standard_normal((w, m)) * 0.1).astype(np.float32)))
    w2_q, s2 = quantize_weight(jnp.asarray((rng.standard_normal((m, w)) * 0.1).astype(np.float32)))
    out = int8_ln_mlp(x, ln_s, ln_b, w1_q, s1, jnp.zeros((m,)), w2_q, s2,
                      jnp.zeros((w,)), interpret=True)
    assert out.shape == (1, 197, w)
    assert np.isfinite(np.asarray(out)).all()


def test_exp2_rows_softmax_semantics():
    """exp2_rows + denominator-fold equals the stable softmax exactly (in
    fp32 round-off) for LN-bounded scores, passes -inf masks through, and
    degrades to uniform-over-clamped (no overflow/NaN) on adversarial rows.

    This is the algebra every attention kernel now relies on: fold
    scale*log2(e) into Q, exp2(min(., 70*log2(e))) for the numerators, one
    (S,D)-shaped divide after p@v (ops/attention.py exp2_rows docstring).
    """
    from aiic_tpu.ops.attention import LOG2E, exp2_rows

    rng = np.random.default_rng(0)

    def fold_softmax(scores):
        p = exp2_rows(jnp.asarray(scores * LOG2E, jnp.float32))
        return p / jnp.sum(p, axis=-1, keepdims=True)

    # 1) typical LN-bounded scores (|s| <= 30): exact agreement
    s = rng.standard_normal((8, 197)).astype(np.float32) * 10.0
    got = np.asarray(fold_softmax(s))
    want = np.asarray(jax.nn.softmax(jnp.asarray(s), axis=-1))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7)

    # 2) -inf additive mask entries -> exactly 0 probability
    s_masked = s.copy()
    s_masked[:, 100:] = -np.inf
    got = np.asarray(fold_softmax(s_masked))
    assert (got[:, 100:] == 0.0).all()
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-6)

    # 3) adversarial huge scores: clamped -> uniform over the clamped set,
    # finite everywhere (the no-max design's graceful-degradation contract)
    s_adv = np.full((4, 197), -50.0, np.float32)
    s_adv[:, :3] = 1e4  # way past the e^70 clamp
    got = np.asarray(fold_softmax(s_adv))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[:, :3], 1.0 / 3.0, rtol=1e-5)

    # 4) unnormalized p@v accumulation cannot overflow fp32 even at the
    # clamp: 197 rows of e^70 numerators times unit-scale V
    p = np.asarray(exp2_rows(jnp.full((1, 197), 70.0 * LOG2E, jnp.float32)))
    assert np.isfinite(p).all()
    acc = p.sum() * 10.0  # |v| ~ 10 worst case for LN-bounded activations
    assert np.isfinite(acc) and acc < 3.4e38


def test_vmem_guard_geometry_selection():
    """ViT-B/16 stays at the measured-good G=2 kernel blocking; ViT-L/14
    geometry (S=257, W=1024, MLP 4096) exceeds the scoped-VMEM budget at
    G=2 everywhere and at G=1 for the UNCHUNKED MLP — which must then take
    the hidden-axis-chunked kernel (C=2 fits), while attention still fits
    at G=1."""
    from aiic_tpu.ops.quant import (
        _VMEM_BUDGET, _attn_vmem_bytes, _mlp_chunk_vmem_bytes, _mlp_vmem_bytes,
    )

    # B/16 (measured to fit on v5e at G=2) must not regress to G=1
    assert _mlp_vmem_bytes(2, 197, 768, 3072, 2) <= _VMEM_BUDGET
    assert _attn_vmem_bytes(2, 197, 768, 2) <= _VMEM_BUDGET
    # L/14 at G=2 must be rejected (true working set ~21 MB > 16 MB ceiling)
    assert _mlp_vmem_bytes(2, 257, 1024, 4096, 2) > _VMEM_BUDGET
    assert _attn_vmem_bytes(2, 257, 1024, 2) > _VMEM_BUDGET
    # L/14 attention fits at G=1; the unchunked MLP does not, but the
    # 2-chunk hidden-axis kernel does (the int8 Pallas path stays live)
    assert _attn_vmem_bytes(1, 257, 1024, 2) <= _VMEM_BUDGET
    assert _mlp_vmem_bytes(1, 257, 1024, 4096, 2) > _VMEM_BUDGET
    assert _mlp_chunk_vmem_bytes(1, 257, 1024, 4096, 2, 2) <= _VMEM_BUDGET


def test_int8_mlp_large_geometry_chunked_kernel():
    """ViT-L/14 geometry routes int8_ln_mlp through the hidden-axis-chunked
    Pallas kernel: exact match vs its XLA reference
    (_int8_mlp_rows(n_chunks=C)) and close to the fp32 MLP math."""
    from aiic_tpu.ops.quant import (
        _int8_mlp_rows, _mlp_plan, int8_ln_mlp, quantize_weight,
    )

    rng = np.random.default_rng(0)
    b, s, w, m = 2, 257, 1024, 4096
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32) * 0.1)
    ln_s = jnp.ones((w,), jnp.float32)
    ln_b = jnp.zeros((w,), jnp.float32)
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.03).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.03).astype(np.float32))
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    b1 = jnp.zeros((m,), jnp.float32)
    b2 = jnp.zeros((w,), jnp.float32)

    out = int8_ln_mlp(x, ln_s, ln_b, w1_q, s1, b1, w2_q, s2, b2,
                      interpret=True)
    assert out.shape == (b, s, w)
    assert np.isfinite(np.asarray(out)).all()

    # agreement with the chunked XLA reference. Not bit-exact: ~0.2% of y
    # values land on a round() boundary and flip one int8 level between the
    # two separately compiled programs (FMA fusion differences) — bound the
    # error at one quantization step and require the bulk to match exactly.
    mode, group, n_chunks = _mlp_plan(b, s, w, m, x.dtype.itemsize)
    assert mode == "chunked" and group == 2 and n_chunks >= 2, (mode, group, n_chunks)
    ref_chunked = _int8_mlp_rows(
        x.reshape(b * s, w), ln_s.reshape(1, w), ln_b.reshape(1, w),
        w1_q, s1.reshape(1, m), b1.reshape(1, m),
        w2_q, s2.reshape(1, w), b2.reshape(1, w), 1e-5, n_chunks=n_chunks,
    ).reshape(b, s, w)
    diff = np.abs(np.asarray(out) - np.asarray(ref_chunked))
    assert diff.max() < 5e-3, diff.max()            # <= one quant level
    assert (diff > 1e-5).mean() < 0.01              # >99% exact

    # fp32 reference
    xf = np.asarray(x, np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    h = (xf - mean) / np.sqrt(var + 1e-5)
    y = h @ np.asarray(w1, np.float64)
    y = y / (1.0 + np.exp(-1.702 * y))
    ref = xf + y @ np.asarray(w2, np.float64)
    rel = np.abs(np.asarray(out, np.float64) - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_int8_attention_xla_fallback_matches_kernel():
    """The XLA fallback path (_int8_attn_rows_xla) is numerically equivalent
    to the Pallas kernel (interpret mode) at a small geometry."""
    from aiic_tpu.ops.quant import (
        _int8_attn_rows_xla, int8_ln_qkv_attention, quantize_weight,
    )

    rng = np.random.default_rng(1)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32) * 0.2)
    ln_s = jnp.ones((w,), jnp.float32)
    ln_b = jnp.zeros((w,), jnp.float32)
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    wqkv_q, sqkv = quantize_weight(wqkv)
    bqkv = jnp.zeros((3 * w,), jnp.float32)
    bo = jnp.zeros((w,), jnp.float32)

    kern = int8_ln_qkv_attention(
        x, ln_s, ln_b, wqkv_q, sqkv, bqkv, wo, bo, None,
        heads=heads, interpret=True)
    fall = _int8_attn_rows_xla(
        x, ln_s.reshape(1, w), ln_b.reshape(1, w), wqkv_q,
        sqkv.reshape(1, 3 * w), bqkv.reshape(1, 3 * w), wo.astype(x.dtype),
        bo.reshape(1, w),
        jnp.zeros((s, s), jnp.float32), heads=heads, dim=dim,
        scale=dim ** -0.5, eps=1e-5)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(fall),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_qkv_vjp_grads_match_xla():
    """pallas_vjp (Pallas fwd in interpret mode + XLA-derived bwd) produces
    the same gradients w.r.t. the fused QKV activations as differentiating
    the plain XLA composition, and the same forward output."""
    from aiic_tpu.ops.attention import (
        _attention_qkv_xla, fused_attention_qkv_vjp,
    )

    rng = np.random.default_rng(3)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * w)).astype(np.float32))
    mask = jnp.asarray(causal_mask(s), jnp.float32)

    def loss_kernel(t):
        return (fused_attention_qkv_vjp(t, mask, heads, True) ** 2).sum()

    def loss_xla(t):
        return (_attention_qkv_xla(t, mask, heads) ** 2).sum()

    out_k = fused_attention_qkv_vjp(qkv, mask, heads, True)
    out_x = _attention_qkv_xla(qkv, mask, heads)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)

    g_k = jax.grad(loss_kernel)(qkv)
    g_x = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=2e-4, atol=2e-4)


def test_attention_bwd_kernel_text_geometry_causal():
    """The hand-written backward kernel at the real text-tower geometry
    (S=77, H=8, D=64, causal mask) matches differentiating the XLA
    composition, in bf16-typical fp32-accumulated precision."""
    from aiic_tpu.ops.attention import (
        _attention_qkv_xla, fused_attention_qkv_bwd,
    )

    rng = np.random.default_rng(5)
    b, s, heads, dim = 2, 77, 8, 64
    w = heads * dim
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    mask = jnp.asarray(causal_mask(s), jnp.float32)

    _, vjp = jax.vjp(lambda t: _attention_qkv_xla(t, mask, heads), qkv)
    (want,) = vjp(g)
    got = fused_attention_qkv_bwd(qkv, mask, g, heads=heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_int8_fused_block_bit_identical_to_kernel_pair():
    """The whole-block int8 kernel (ops/quant.int8_block) vs the
    attn-kernel + MLP-kernel pair at ViT-B/32 geometry (S=50 — where the
    FULL fused blocking is what production auto-selects; the chunked
    variant is covered by its own bit-identity test): the fused
    program casts the attention output to the block dtype in-kernel —
    exactly what the kernel boundary did — so the composition must match
    bit for bit."""
    from aiic_tpu.ops.quant import (
        _block_plan, int8_block, int8_ln_mlp, int8_ln_qkv_attention,
        quantize_weight,
    )

    rng = np.random.default_rng(31)
    b, s, w, heads, m = 2, 50, 768, 12, 3072
    assert _block_plan(b, s, w, m, 2) == ("full", 2, 1)
    x = jnp.asarray((rng.standard_normal((b, s, w)) * 0.3).astype(np.float32),
                    jnp.bfloat16)
    ln1_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln1_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    ln2_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln2_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.03).astype(np.float32))
    bqkv = jnp.asarray((0.1 * rng.standard_normal(3 * w)).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((w, w)) * 0.03).astype(np.float32))
    bo = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.03).astype(np.float32))
    b1 = jnp.asarray((0.1 * rng.standard_normal(m)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.03).astype(np.float32))
    b2 = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    wqkv_q, sqkv = quantize_weight(wqkv)
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)

    pair = int8_ln_mlp(
        int8_ln_qkv_attention(
            x, ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wo, bo, None,
            heads=heads, interpret=True),
        ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2, interpret=True)
    fused = int8_block(
        x, ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wo, bo, None,
        ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2,
        heads=heads, interpret=True)
    assert fused is not None  # ViT-B/16 must fit the fused-kernel VMEM budget
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(pair, np.float32))


def test_int8_fused_block_large_geometry_falls_back():
    """ViT-H/14-scale geometry (W=1280, M=5120, S=257) exceeds the
    fused-block VMEM budget in EVERY blocking (full and chunked — the
    resident attention weights alone crowd out the MLP stream) — int8_block
    returns None and clip.block keeps running the kernel pair (whose own
    guards handle the geometry). ViT-L/14's FULL form also exceeds budget
    at G=1, but its chunked form fits (covered by the plan test)."""
    from aiic_tpu.ops.quant import _VMEM_BUDGET, _block_vmem_bytes, int8_block

    assert _block_vmem_bytes(1, 257, 1024, 4096, 2) > _VMEM_BUDGET
    # ViT-B/16 fits at G=1 but not G=2
    assert _block_vmem_bytes(1, 197, 768, 3072, 2) <= _VMEM_BUDGET
    assert _block_vmem_bytes(2, 197, 768, 3072, 2) > _VMEM_BUDGET

    rng = np.random.default_rng(0)
    b, s, w, heads, m = 1, 257, 1280, 16, 5120
    x = jnp.asarray((rng.standard_normal((b, s, w)) * 0.1).astype(np.float32),
                    jnp.bfloat16)
    zeros = lambda *shape: jnp.zeros(shape, jnp.float32)
    out = int8_block(
        x, jnp.ones((w,)), zeros(w),
        jnp.zeros((w, 3 * w), jnp.int8), jnp.ones((1, 3 * w)), zeros(3 * w),
        zeros(w, w), zeros(w), None,
        jnp.ones((w,)), zeros(w),
        jnp.zeros((w, m), jnp.int8), jnp.ones((1, m)), zeros(m),
        jnp.zeros((m, w), jnp.int8), jnp.ones((1, w)), zeros(w),
        heads=heads, interpret=True)
    assert out is None


def test_int8_fused_block_env_gate_wiring(monkeypatch):
    """AIIC_FUSED_BLOCK=1 routes the quantized bf16 tower through
    ops/quant.int8_block with output identical to the default kernel-pair
    path (the fused kernel is bit-identical by construction)."""
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params
    from aiic_tpu.ops.quant import quantize_model

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    qparams = quantize_model(params)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (2, TINY_TEST.image_size, TINY_TEST.image_size, 3),
                            jnp.bfloat16)
    base = np.asarray(encode_image(qparams, px, TINY_TEST, dtype=jnp.bfloat16,
                                   attn_impl="pallas"), np.float32)
    monkeypatch.setenv("AIIC_FUSED_BLOCK", "1")
    fused = np.asarray(encode_image(qparams, px, TINY_TEST, dtype=jnp.bfloat16,
                                    attn_impl="pallas"), np.float32)
    np.testing.assert_array_equal(fused, base)


def test_l14_geometry_serving_tower_kernels_close_to_fp():
    """The serving quantization at ViT-L/14 GEOMETRY (S=257, W=1024,
    M=4096; layers cut to 2 for test cost): the image tower routes through
    G=1 int8 attention + the hidden-axis-CHUNKED int8 MLP kernel and stays
    >=0.999 cosine vs the bf16 XLA path."""
    import dataclasses

    from aiic_tpu.models import VIT_L_14, encode_image, init_clip_params
    from aiic_tpu.models.config import TowerConfig
    from aiic_tpu.ops.quant import quantize_model

    cfg = dataclasses.replace(
        VIT_L_14,
        # depth/batch cut to the minimum that still routes through both
        # kernels at the REAL per-layer geometry (full-depth coverage runs
        # on the chip: tools/zoo_cosine.py, min cosine 0.999833)
        vision=TowerConfig(width=1024, layers=1, heads=16),
        text=TowerConfig(width=768, layers=1, heads=12),
    )
    assert cfg.vision_seq_len == 257
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_model(params)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (1, cfg.image_size, cfg.image_size, 3),
                            jnp.bfloat16)
    base = np.asarray(encode_image(params, px, cfg, dtype=jnp.bfloat16,
                                   attn_impl="xla"), np.float32)
    quant = np.asarray(encode_image(qparams, px, cfg, dtype=jnp.bfloat16,
                                    attn_impl="pallas"), np.float32)
    cos = (base * quant).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(quant, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos


def test_l14_336_geometry_serving_tower_kernels_close_to_fp():
    """ViT-L/14@336px GEOMETRY (S=577, W=1024; layers cut to 1 for test
    cost): the int8 attention working set exceeds VMEM even at G=1 so the
    guards route attention through the XLA int8 fallback, while the MLP
    stays on the hidden-axis-chunked Pallas kernel — and the composition
    holds >=0.999 cosine vs the bf16 XLA path."""
    import dataclasses

    from aiic_tpu.models import VIT_L_14_336, encode_image, init_clip_params
    from aiic_tpu.models.config import TowerConfig
    from aiic_tpu.ops.quant import (
        _VMEM_BUDGET, _attn_vmem_bytes, _mlp_plan, quantize_model,
    )

    # guard expectations at the real geometry
    assert _attn_vmem_bytes(1, 577, 1024, 2) > _VMEM_BUDGET  # attention -> XLA
    mode, g, c = _mlp_plan(1, 577, 1024, 4096, 2)
    assert mode == "chunked" and c >= 2                       # MLP -> chunked

    cfg = dataclasses.replace(
        VIT_L_14_336,
        vision=TowerConfig(width=1024, layers=1, heads=16),
        text=TowerConfig(width=768, layers=1, heads=12),
    )
    assert cfg.vision_seq_len == 577
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_model(params)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (1, cfg.image_size, cfg.image_size, 3),
                            jnp.bfloat16)
    base = np.asarray(encode_image(params, px, cfg, dtype=jnp.bfloat16,
                                   attn_impl="xla"), np.float32)
    quant = np.asarray(encode_image(qparams, px, cfg, dtype=jnp.bfloat16,
                                    attn_impl="pallas"), np.float32)
    cos = (base * quant).sum(-1) / (
        np.linalg.norm(base, axis=-1) * np.linalg.norm(quant, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos


def test_fused_block_auto_selection_rule():
    """The fused whole-block serving kernel auto-engages exactly where its
    G=2 working set fits (measured: WIN at ViT-B/32 16,702 vs 16,160 img/s;
    LOSS at ViT-B/16 where it forces G=1 — models.clip gates on this)."""
    from aiic_tpu.ops.quant import _VMEM_BUDGET, _block_vmem_bytes

    # B/16: G=2 fused does not fit -> kernel pair stays the serving default
    assert _block_vmem_bytes(2, 197, 768, 3072, 2) > _VMEM_BUDGET
    # B/32 (S=50): G=2 fits -> fused auto-engages
    assert _block_vmem_bytes(2, 50, 768, 3072, 2) <= _VMEM_BUDGET


def test_fused_block_plan_selections():
    """_block_plan's preference order (full blockings before chunked —
    measured: full-G1 5,588 > chunked-G2 5,395 img/s at B/16 — larger
    group within each mode): B/32 full-G2; B/16 full-G1; L/14 chunked-G1;
    H/14-scale nothing (resident attention weights crowd out even the
    chunked form)."""
    from aiic_tpu.ops.quant import _block_plan

    assert _block_plan(1024, 50, 768, 3072, 2) == ("full", 2, 1)
    assert _block_plan(1024, 197, 768, 3072, 2) == ("full", 1, 1)
    # L/14: the full form never fits; the chunked form at G=1 does
    mode, g, c = _block_plan(512, 257, 1024, 4096, 2)
    assert (mode, g) == ("chunked", 1) and c >= 8
    # ViT-H/14-scale geometry: resident attention weights alone crowd out
    # even the chunked form -> the kernel pair keeps the geometry
    assert _block_plan(256, 257, 1280, 5120, 2) is None
    # odd batch cannot group
    assert _block_plan(3, 197, 768, 3072, 2) == ("full", 1, 1)


def test_int8_chunked_fused_block_matches_reference():
    """The hidden-axis-chunked fused block at ViT-B/16 geometry (the G=2
    blocking the full fused kernel cannot reach) vs the attention kernel +
    chunked-MLP reference composition (_int8_mlp_rows(n_chunks=C) mirrors
    the chunk kernel's per-(row, chunk) quantization and fp32 summation
    order). Unlike the full-block test the two sides here are DIFFERENT
    compiled programs (grid-step accumulation vs a Python chunk loop), so
    per-program FMA contraction flips ~0.1% of round() decisions by one
    int8 level (same bound as the chunked-MLP kernel's own test); a real
    logic error (wrong chunk, stale scratch, group mixup) blows past the
    one-quant-level bound and still fails."""
    from aiic_tpu.ops.quant import (
        _int8_mlp_rows, int8_block, int8_ln_qkv_attention, quantize_weight,
    )

    rng = np.random.default_rng(47)
    b, s, w, heads, m = 2, 197, 768, 12, 3072
    x = jnp.asarray((rng.standard_normal((b, s, w)) * 0.3).astype(np.float32),
                    jnp.bfloat16)
    ln1_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln1_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    ln2_s = jnp.asarray((1 + 0.1 * rng.standard_normal(w)).astype(np.float32))
    ln2_b = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.03).astype(np.float32))
    bqkv = jnp.asarray((0.1 * rng.standard_normal(3 * w)).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((w, w)) * 0.03).astype(np.float32))
    bo = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((w, m)) * 0.03).astype(np.float32))
    b1 = jnp.asarray((0.1 * rng.standard_normal(m)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((m, w)) * 0.03).astype(np.float32))
    b2 = jnp.asarray((0.1 * rng.standard_normal(w)).astype(np.float32))
    wqkv_q, sqkv = quantize_weight(wqkv)
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)

    # chunked-G2 fits the VMEM budget at B/16 but the plan prefers full-G1
    # (measured faster); force the chunked blocking to test its numerics
    from aiic_tpu.ops.quant import _VMEM_BUDGET, _block_chunk_vmem_bytes

    n_chunks = 4
    assert _block_chunk_vmem_bytes(2, s, w, m, n_chunks, 2) <= _VMEM_BUDGET

    y1 = int8_ln_qkv_attention(
        x, ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wo, bo, None,
        heads=heads, interpret=True)
    want = _int8_mlp_rows(
        y1.reshape(b * s, w), ln2_s.reshape(1, w), ln2_b.reshape(1, w),
        w1_q, s1.reshape(1, m), b1.reshape(1, m),
        w2_q, s2.reshape(1, w), b2.reshape(1, w),
        1e-5, n_chunks=n_chunks).reshape(b, s, w)
    fused = int8_block(
        x, ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wo, bo, None,
        ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2,
        heads=heads, interpret=True, plan_override=("chunked", 2, n_chunks))
    assert fused is not None

    diff = np.abs(np.asarray(fused, np.float32) - np.asarray(want, np.float32))
    assert diff.max() < 1e-2, diff.max()            # <= one quant level
    assert (diff > 1e-5).mean() < 0.01, (diff > 1e-5).mean()  # >99% exact


# ---------------------------------------------------------------------------
# Patch-major uint8 wire format (folded normalize+patchify embed)
# ---------------------------------------------------------------------------


def test_patch_major_embed_fold_is_exactly_normalize_then_matmul():
    """x_u8 @ (s*W) - (m*s)@W  ==  normalize(x_u8) @ W at fp32 (the algebra
    behind the patch-major wire — ops.preprocess.patch_norm_constants)."""
    from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
    from aiic_tpu.ops.preprocess import patch_norm_constants, to_patch_major

    rng = np.random.default_rng(0)
    p = 8
    u8 = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    w = rng.standard_normal((3 * p * p, 16)).astype(np.float32) * 0.05

    patches = to_patch_major(u8, p).astype(np.float64)
    s, ms = patch_norm_constants(p)
    got = patches @ (s[:, None] * w).astype(np.float64) - ms.astype(np.float64) @ w

    # reference: per-channel normalize then patchify (models.clip order)
    from aiic_tpu.models.clip import patchify

    norm = ((u8.astype(np.float64) / 255.0) - CLIP_MEAN) / CLIP_STD
    want = np.asarray(patchify(jnp.asarray(norm), p)) @ w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_to_patch_major_matches_patchify_order():
    from aiic_tpu.ops.preprocess import to_patch_major
    from aiic_tpu.models.clip import patchify

    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        to_patch_major(u8, 8),
        np.asarray(patchify(jnp.asarray(u8.astype(np.float32)), 8)).astype(np.uint8),
    )


def test_encode_image_patch_major_matches_hwc_fp32():
    """encode_image on patch-major uint8 == encode_image on the normalized
    HWC float input, end to end through the tower (fp32, highest precision)."""
    from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params
    from aiic_tpu.ops.preprocess import to_patch_major

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    norm = (((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        a = np.asarray(encode_image(params, jnp.asarray(norm), TINY_TEST))
        b = np.asarray(
            encode_image(params, jnp.asarray(to_patch_major(u8, TINY_TEST.patch_size)), TINY_TEST)
        )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-5)


def test_encode_image_rank3_float_rejected():
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    bad = jnp.zeros((2, 16, 192), jnp.float32)
    with pytest.raises(ValueError, match="patch-major uint8"):
        encode_image(params, bad, TINY_TEST)


def test_classify_batch_patch_wire_matches_hwc_uint8():
    """The fused classify program gives the same verdicts/top-k on the
    patch-major wire as on the HWC uint8 wire (fp32)."""
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.models import TINY_TEST, init_clip_params
    from aiic_tpu.ops.preprocess import to_patch_major

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    det = rng.standard_normal((40, TINY_TEST.embed_dim)).astype(np.float32)
    det /= np.linalg.norm(det, axis=-1, keepdims=True)
    cat = rng.standard_normal((2, 6, TINY_TEST.embed_dim)).astype(np.float32)
    mask = np.ones((2, 6), bool)

    kw = dict(config=TINY_TEST, interior_count=11, dtype=jnp.float32, attn_impl="xla")
    with jax.default_matmul_precision("highest"):
        a = jax.tree.map(np.asarray, classify_batch(
            params, jnp.asarray(u8), jnp.asarray(det), jnp.asarray(cat),
            jnp.asarray(mask), **kw))
        b = jax.tree.map(np.asarray, classify_batch(
            params, jnp.asarray(to_patch_major(u8, TINY_TEST.patch_size)),
            jnp.asarray(det), jnp.asarray(cat), jnp.asarray(mask), **kw))
    np.testing.assert_array_equal(a["top_idx"], b["top_idx"])
    np.testing.assert_allclose(a["interior_mass"], b["interior_mass"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a["topk_vals"], b["topk_vals"], rtol=1e-3, atol=1e-5)


def test_quantize_patch_embed_close_to_exact_normalize_matmul():
    """int8 folded embed (exact uint8 activations, int8 weights) stays within
    weight-quantization error of normalize-then-matmul at fp64."""
    from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
    from aiic_tpu.models.clip import patchify
    from aiic_tpu.ops.preprocess import quantize_patch_embed, to_patch_major

    rng = np.random.default_rng(4)
    p = 8
    u8 = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    w = rng.standard_normal((3 * p * p, 16)).astype(np.float32) * 0.05

    q = quantize_patch_embed(w)
    pm = to_patch_major(u8, p)
    xs8 = (pm.astype(np.int16) - 128).astype(np.int8)
    got = (xs8.astype(np.int32) @ np.asarray(q["wq"], np.int32)
           ).astype(np.float64) * np.asarray(q["wsc"]) + np.asarray(q["c2"])

    norm = ((u8.astype(np.float64) / 255.0) - CLIP_MEAN) / CLIP_STD
    want = np.asarray(patchify(jnp.asarray(norm), p)) @ w.astype(np.float64)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 2e-2
    cos = (got.ravel() @ want.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.9999, cos


def test_encode_image_int8_embed_engages_on_patch_wire_only():
    """quantize_model attaches patch_embed_q; encode_image uses it on rank-3
    uint8 inputs (close to the bf16 folded path) and IGNORES it on the
    rank-4 float parity path (bit-identical to un-quantized embed there)."""
    from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD
    from aiic_tpu.models import TINY_TEST, encode_image, init_clip_params
    from aiic_tpu.ops.preprocess import quantize_patch_embed, to_patch_major

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    vq = dict(params["visual"])
    vq["patch_embed_q"] = quantize_patch_embed(vq["patch_embed"])
    params_q = dict(params, visual=vq)

    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    pm = jnp.asarray(to_patch_major(u8, TINY_TEST.patch_size))
    norm = (((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        plain = np.asarray(encode_image(params, pm, TINY_TEST))
        quant = np.asarray(encode_image(params_q, pm, TINY_TEST))
        # embed weight quant error propagated through the tower: small but
        # nonzero — and it must actually differ (proof the int8 path ran)
        assert not np.array_equal(plain, quant)
        cos = (plain * quant).sum(-1) / (
            np.linalg.norm(plain, axis=-1) * np.linalg.norm(quant, axis=-1))
        assert cos.min() > 0.999, cos.min()

        # rank-4 float path ignores patch_embed_q entirely
        a = np.asarray(encode_image(params, jnp.asarray(norm), TINY_TEST))
        b = np.asarray(encode_image(params_q, jnp.asarray(norm), TINY_TEST))
        np.testing.assert_array_equal(a, b)


def test_int8_attn_xla_fallback_chunked_matches_unchunked(monkeypatch):
    """The batch-chunked XLA fallback (large-S geometries whose probability
    tensor would OOM HBM, e.g. ViT-L/14@336 at B=1024) is bit-identical to
    the unchunked form — lax.map chunks a per-image computation."""
    from aiic_tpu.ops import quant

    rng = np.random.default_rng(8)
    bsz, seq, width, heads = 8, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((bsz, seq, width)).astype(np.float32))
    w = rng.standard_normal((width, 3 * width)).astype(np.float32) * 0.05
    wq, sq = quant.quantize_weight(jnp.asarray(w))
    kw = dict(
        ln_scale=jnp.ones((1, width)), ln_bias=jnp.zeros((1, width)),
        wqkv_q=wq, sqkv=jnp.asarray(sq).reshape(1, -1),
        bqkv=jnp.zeros((1, 3 * width)),
        wo=jnp.asarray(rng.standard_normal((width, width)).astype(np.float32) * 0.05),
        bo=jnp.zeros((1, width)), mask=jnp.zeros((seq, seq), jnp.float32),
        heads=heads, dim=width // heads, scale=(width // heads) ** -0.5,
        eps=1e-5,
    )
    whole = np.asarray(quant._int8_attn_rows_xla(x, **kw))
    monkeypatch.setattr(quant, "_FALLBACK_PROBS_BUDGET",
                        heads * seq * seq * 4 * 2)  # force chunk=2
    chunked = np.asarray(quant._int8_attn_rows_xla(x, **kw))
    # same per-image math; tolerance covers backend matmul-blocking
    # differences across batch shapes (CPU oneDNN), not algorithmic drift
    np.testing.assert_allclose(whole, chunked, rtol=1e-5, atol=1e-5)


def test_int8_attn_large_s_path_matches_xla_fallback():
    """The large-S overflow path (XLA int8 projections + Pallas packed-qkv
    core — selected when the half-block kernel exceeds VMEM, e.g.
    ViT-L/14@336) matches the pure-XLA fallback numerics."""
    from aiic_tpu.ops.quant import (
        _int8_attn_large_s, _int8_attn_rows_xla, quantize_weight,
    )

    rng = np.random.default_rng(9)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32) * 0.2)
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    wqkv_q, sqkv = quantize_weight(wqkv)
    kw = dict(
        ln_scale=jnp.ones((1, w)), ln_bias=jnp.zeros((1, w)),
        wqkv_q=wqkv_q, sqkv=sqkv.reshape(1, 3 * w),
        bqkv=jnp.zeros((1, 3 * w)), wo=wo.astype(x.dtype),
        bo=jnp.zeros((1, w)), mask=jnp.zeros((s, s), jnp.float32),
        heads=heads,
    )
    large = _int8_attn_large_s(x, **kw, eps=1e-5, interpret=True)
    fall = _int8_attn_rows_xla(x, **kw, dim=dim, scale=dim ** -0.5, eps=1e-5)
    np.testing.assert_allclose(np.asarray(large), np.asarray(fall),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_qkv_vmem_gate_calibration():
    """The packed-qkv core's VMEM estimator: ViT-B / text / L/14 geometries
    fit at the measured G=2, and ViT-L/14@336 (S=577, W=1024 — Mosaic
    reports 17.93 MB actual at G=1 vs the 16 MB scoped ceiling) must NOT
    fit even at G=1, so the int8 overflow path routes it to the chunked
    XLA fallback instead of a failing kernel compile."""
    from aiic_tpu.ops.attention import qkv_core_fits

    assert qkv_core_fits(197, 768, 2, group=2)    # ViT-B/16 vision
    assert qkv_core_fits(77, 512, 2, group=2)     # text tower
    assert qkv_core_fits(257, 1024, 2, group=2)   # ViT-L/14 vision
    assert not qkv_core_fits(577, 1024, 2, group=1)  # ViT-L/14@336


def test_headgroup_kernel_matches_allheads_core():
    """fused_attention_qkv_headgroups on the head-major layout ==
    fused_attention_qkv on the standard packed layout."""
    from aiic_tpu.ops.attention import (
        fused_attention_qkv, fused_attention_qkv_headgroups, headmajor_perm,
    )

    rng = np.random.default_rng(12)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * w)).astype(np.float32))
    mask = jnp.asarray(rng.standard_normal((s, s)).astype(np.float32)) * 0.1

    want = np.asarray(fused_attention_qkv(qkv, mask, heads=heads, interpret=True))
    qkv_hm = np.asarray(qkv)[:, :, headmajor_perm(w, heads)]
    for hg in (1, 2, 4):
        got = np.asarray(fused_attention_qkv_headgroups(
            jnp.asarray(qkv_hm), mask, heads=heads, head_group=hg, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5, err_msg=f"hg={hg}")


def test_int8_attn_large_s_headmajor_matches_xla_fallback(monkeypatch):
    """When even the all-heads core exceeds VMEM, the large-S path permutes
    the QKV weight head-major and runs the head-grouped core — numerics
    must still match the pure-XLA fallback."""
    from aiic_tpu.ops import attention as A
    from aiic_tpu.ops.quant import (
        _int8_attn_large_s, _int8_attn_rows_xla, quantize_weight,
    )

    rng = np.random.default_rng(13)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32) * 0.2)
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    wqkv_q, sqkv = quantize_weight(wqkv)
    kw = dict(
        ln_scale=jnp.ones((1, w)), ln_bias=jnp.zeros((1, w)),
        wqkv_q=wqkv_q, sqkv=sqkv.reshape(1, 3 * w),
        bqkv=jnp.zeros((1, 3 * w)), wo=wo.astype(x.dtype),
        bo=jnp.zeros((1, w)), mask=jnp.zeros((s, s), jnp.float32),
        heads=heads,
    )
    fall = _int8_attn_rows_xla(x, **kw, dim=dim, scale=dim ** -0.5, eps=1e-5)

    # budget below the all-heads core but above the hg=2 grouped core
    full = A.qkv_core_vmem_bytes(1, s, w, 4)
    hg2 = A.qkv_core_vmem_bytes(1, s, 2 * dim, 4)
    assert hg2 < full
    monkeypatch.setattr(A, "_CORE_VMEM_BUDGET", (hg2 + full) // 2)
    assert A.pick_head_group(s, heads, dim, 4) == 2
    large = _int8_attn_large_s(x, **kw, eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(large), np.asarray(fall),
                               rtol=2e-5, atol=2e-5)


def test_bf16_half_block_vmem_gate_calibration():
    """The bf16 half-block estimator (ops.attention.ln_attn_vmem_bytes):
    every shipped kernel geometry keeps its measured grouping, and the
    ViT-L/14 geometries — whose compute-dtype QKV weight alone is 6.3 MB —
    route to the large-S composition instead of a failing Mosaic compile."""
    from aiic_tpu.ops import attention as A

    assert A.ln_attn_vmem_bytes(2, 197, 768, 2) <= A._CORE_VMEM_BUDGET  # B/16 G2
    assert A.ln_attn_vmem_bytes(2, 77, 512, 2) <= A._CORE_VMEM_BUDGET   # text G2
    assert A.ln_attn_vmem_bytes(2, 50, 768, 2) <= A._CORE_VMEM_BUDGET   # B/32 G2
    assert A.ln_attn_vmem_bytes(1, 257, 1024, 2) > A._CORE_VMEM_BUDGET  # L/14
    assert A.ln_attn_vmem_bytes(1, 577, 1024, 2) > A._CORE_VMEM_BUDGET  # L/14@336


def test_bf16_half_block_large_s_ladder_matches_kernel(monkeypatch):
    """fused_ln_qkv_attention's large-S fallback ladder (XLA LN/proj +
    all-heads core / head-grouped core / batch-chunked XLA core) matches the
    fused kernel's numerics at every tier, forced via the budget knob."""
    from aiic_tpu.ops import attention as A

    rng = np.random.default_rng(21)
    b, s, heads, dim = 2, 16, 4, 8
    w = heads * dim
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32) * 0.2)
    args = (
        x,
        jnp.asarray(rng.standard_normal((w,)).astype(np.float32) * 0.1 + 1.0),
        jnp.asarray(rng.standard_normal((w,)).astype(np.float32) * 0.1),
        jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32)),
        jnp.asarray((rng.standard_normal((3 * w,)) * 0.1).astype(np.float32)),
        jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32)),
        jnp.asarray((rng.standard_normal((w,)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.standard_normal((s, s)).astype(np.float32) * 0.1),
    )
    want = np.asarray(
        A.fused_ln_qkv_attention(*args, heads=heads, interpret=True))

    half = A.ln_attn_vmem_bytes(1, s, w, 4)
    full_core = A.qkv_core_vmem_bytes(1, s, w, 4)
    hg2_core = A.qkv_core_vmem_bytes(1, s, 2 * dim, 4)
    hg1_core = A.qkv_core_vmem_bytes(1, s, dim, 4)
    assert hg1_core < hg2_core < full_core < half

    tiers = {
        "all-heads core": (full_core + half) // 2,
        "head-grouped core": (hg2_core + full_core) // 2,
        "chunked-XLA core": hg1_core - 1,
    }
    for name, budget in tiers.items():
        monkeypatch.setattr(A, "_CORE_VMEM_BUDGET", budget)
        got = np.asarray(
            A.fused_ln_qkv_attention(*args, heads=heads, interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5,
                                   err_msg=name)


def test_fused_attention_qkv_overflow_falls_back_to_chunked_xla(monkeypatch):
    """fused_attention_qkv on a geometry where no core grouping fits must
    return the batch-chunked XLA core's numerics instead of compiling an
    overflowing kernel."""
    from aiic_tpu.ops import attention as A

    rng = np.random.default_rng(22)
    b, s, heads, dim = 4, 16, 4, 8
    w = heads * dim
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * w)).astype(np.float32))
    mask = jnp.asarray(rng.standard_normal((s, s)).astype(np.float32)) * 0.1

    want = np.asarray(A._attention_qkv_xla(qkv, mask, heads))
    monkeypatch.setattr(A, "_CORE_VMEM_BUDGET", 1)
    # force multiple lax.map chunks too
    monkeypatch.setattr(A, "_FALLBACK_PROBS_BUDGET", heads * s * s * 4 * 2)
    got = np.asarray(A.fused_attention_qkv(qkv, mask, heads=heads, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
