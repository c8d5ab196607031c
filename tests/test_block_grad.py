"""Whole-text-block backward kernel (ops/block_grad): gradient parity vs the
XLA composition, and end-to-end equivalence through the trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.adapters import LoRAConfig, init_text_lora
from aiic_tpu.models import TINY_TEST, init_clip_params
from aiic_tpu.ops.attention import _attention_qkv_xla
from aiic_tpu.ops.block_grad import text_block_lora

CFG = TINY_TEST


def _setup():
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    blocks = params["text"]["blocks"]
    bp = jax.tree.map(lambda v: v[0],
                      {k: blocks[k] for k in ("ln1", "attn", "ln2", "mlp")})
    lc = LoRAConfig(4, 8, ("out_proj", "c_fc", "c_proj"))
    ltree = init_text_lora(jax.random.PRNGKey(1), CFG, lc)
    rng = np.random.default_rng(0)
    # nonzero B so every LoRA path carries signal
    lora = jax.tree.map(
        lambda v: v[0] + 0.02 * rng.standard_normal(v[0].shape).astype(np.float32),
        ltree)
    S, W = CFG.context_length, CFG.text.width
    x = jnp.asarray(rng.standard_normal((4, S, W)).astype(np.float32))
    mask = jnp.triu(jnp.full((S, S), -jnp.inf, jnp.float32), k=1)
    return bp, lora, x, mask, lc.scaling


def _ref_fwd(x, bp, lora, mask, heads, scaling):
    def lin(v, w, b):
        return jnp.dot(v, w, preferred_element_type=jnp.float32) + b

    def ld(v, f):
        return scaling * jnp.dot(
            jnp.dot(v, f["A"], preferred_element_type=jnp.float32), f["B"],
            preferred_element_type=jnp.float32)

    def ln(v, p):
        m = v.mean(-1, keepdims=True)
        var = jnp.square(v - m).mean(-1, keepdims=True)
        return (v - m) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    h1 = ln(x, bp["ln1"])
    qkv = lin(h1, bp["attn"]["wqkv"], bp["attn"]["bqkv"])
    a = _attention_qkv_xla(qkv, mask, heads).reshape(x.shape)
    y1 = x + lin(a, bp["attn"]["wo"], bp["attn"]["bo"]) + ld(a, lora["out_proj"])
    h2 = ln(y1, bp["ln2"])
    f = lin(h2, bp["mlp"]["w1"], bp["mlp"]["b1"]) + ld(h2, lora["c_fc"])
    u = f * jax.nn.sigmoid(1.702 * f)
    return y1 + lin(u, bp["mlp"]["w2"], bp["mlp"]["b2"]) + ld(u, lora["c_proj"])


def test_block_kernel_grads_match_xla_composition():
    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads

    def loss_ref(x, lora):
        return jnp.sum(jnp.sin(_ref_fwd(x, bp, lora, mask, heads, scaling)))

    def loss_ker(x, lora):
        return jnp.sum(jnp.sin(
            text_block_lora(x, bp, lora, mask, heads, scaling, True)))

    y_ref = _ref_fwd(x, bp, lora, mask, heads, scaling)
    y_ker = text_block_lora(x, bp, lora, mask, heads, scaling, True)
    np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                               atol=5e-6)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, lora)
    gk = jax.jit(jax.grad(loss_ker, argnums=(0, 1)))(x, lora)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=1e-5)
    for point in ("out_proj", "c_fc", "c_proj"):
        for fac in ("A", "B"):
            np.testing.assert_allclose(
                np.asarray(gk[1][point][fac]), np.asarray(gr[1][point][fac]),
                atol=1e-5, err_msg=f"{point}.{fac}")


def test_block_fused_train_step_matches_xla():
    """attn_impl='block_fused' through make_train_step produces the same
    loss and adapter updates as the plain XLA path (TINY, fp32, CPU)."""
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal(
        (8, CFG.image_size, CFG.image_size, 3)).astype(np.float32))
    tokens = np.random.default_rng(1).integers(
        1, CFG.vocab_size - 2, (8, CFG.context_length)).astype(np.int32)
    tokens[:, 0] = CFG.vocab_size - 2
    tokens[:, -1] = CFG.vocab_size - 1
    tokens = jnp.asarray(tokens)
    params = init_clip_params(jax.random.PRNGKey(0), CFG)

    out = {}
    for name, impl in (("xla", "xla"), ("block", "block_fused")):
        tc = TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4, seed=0,
                         attn_impl=impl)
        opt = make_optimizer(tc, 1)
        lora = init_text_lora(jax.random.PRNGKey(1), CFG,
                              LoRAConfig(2, 4, tc.attach))
        opt_state = opt.init(lora)
        ts, _ = make_train_step(CFG, tc, opt)
        loss, new_lora, _ = jax.jit(ts)(params, lora, opt_state, pixels,
                                        tokens, jax.random.PRNGKey(0))
        out[name] = (float(loss), new_lora)

    np.testing.assert_allclose(out["block"][0], out["xla"][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out["xla"][1]),
                    jax.tree.leaves(out["block"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_block_fused_falls_back_without_full_attach():
    """A lora tree missing out_proj routes to the default path (no crash,
    same math as xla for that attach set)."""
    from aiic_tpu.models.clip import encode_text

    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    lc = LoRAConfig(2, 4, ("c_fc", "c_proj"))
    lora = init_text_lora(jax.random.PRNGKey(1), CFG, lc)
    tokens = np.random.default_rng(1).integers(
        1, CFG.vocab_size - 2, (4, CFG.context_length)).astype(np.int32)
    tokens = jnp.asarray(tokens)
    a = encode_text(params, tokens, CFG, attn_impl="block_fused",
                    lora=lora, lora_scaling=lc.scaling)
    b = encode_text(params, tokens, CFG, attn_impl="xla",
                    lora=lora, lora_scaling=lc.scaling)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_block_fused_with_dropout_falls_back_and_trains():
    """dropout>0 can't use the kernel; the trainer must fall back to the
    autodiff path WITH remat intact and still train (review finding)."""
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal(
        (4, CFG.image_size, CFG.image_size, 3)).astype(np.float32))
    tokens = jnp.asarray(np.full((4, CFG.context_length), 3, np.int32))
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    tc = TrainConfig(epochs=1, batch_size=4, rank=2, alpha=4, seed=0,
                     attn_impl="block_fused", lora_dropout=0.5)
    opt = make_optimizer(tc, 1)
    lora = init_text_lora(jax.random.PRNGKey(1), CFG, LoRAConfig(2, 4, tc.attach))
    ts, _ = make_train_step(CFG, tc, opt)
    loss, new_lora, _ = jax.jit(ts)(params, lora, opt.init(lora), pixels,
                                    tokens, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_explicit_pallas_impl_under_mesh_resolves():
    """Kernel text impls are legal under a mesh (they run inside
    make_train_step's shard_map over ('data',) with replicated text
    weights); the step must resolve and EXPOSE the kernel impl instead of
    raising or silently falling back to XLA. Numerics parity of the mesh
    kernel path is covered by tests/test_parallel.py."""
    import optax

    from aiic_tpu.parallel import create_mesh
    from aiic_tpu.train.trainer import TrainConfig, make_train_step

    mesh = create_mesh(8, tp=2)
    for impl in ("pallas_vjp", "block_fused"):
        ts, es = make_train_step(
            CFG, TrainConfig(epochs=1, batch_size=8, attn_impl=impl),
            optax.adamw(1e-4), mesh=mesh)
        assert ts.text_impl == impl, (impl, ts.text_impl)
        assert es.text_impl == impl


def test_text_block_fits_geometry_guard():
    """The whole-block kernel pair must advertise VMEM fit honestly: shipped
    text-tower geometries take the unchunked kernels; an L/14-class 768-wide
    tower (whose resident weights alone are ~14 MB bf16) exceeds the
    unchunked budget but gets a hidden-axis-CHUNKED plan; geometries beyond
    even chunking are rejected so the trainer falls back to autodiff instead
    of dying in Mosaic allocation."""
    from aiic_tpu.ops.block_grad import (
        text_block_fits,
        text_block_plan,
        text_block_supported,
    )

    assert text_block_fits(77, 512, 2048, 8, 2)  # ViT-B/16 text tower
    assert text_block_fits(CFG.context_length, CFG.text.width,
                           CFG.text.mlp_dim, CFG.text.heads, 2)
    assert text_block_plan(77, 512, 2048, 8, 2)[1] == 1  # unchunked preferred
    # L/14-class text tower: no unchunked fit, but a chunked plan exists
    assert not text_block_fits(77, 768, 3072, 12, 2)
    plan = text_block_plan(77, 768, 3072, 12, 2)
    assert plan is not None and plan[1] > 1
    assert text_block_supported(77, 768, 3072, 12, 2)
    # beyond chunking: resident wqkv+wo alone exceed the budget
    assert not text_block_supported(77, 1536, 6144, 12, 2)


def test_oversized_geometry_raises_clear_error():
    """Calling the kernel entry point directly at a geometry no blocking can
    cover (resident attention weights alone exceed VMEM) must raise a clear
    ValueError before Pallas compilation, not an opaque Mosaic failure."""
    import pytest

    from aiic_tpu.ops.block_grad import text_block_fwd

    S, W, M, H = 77, 1536, 6144, 12
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    bp = {
        "ln1": {"scale": f32(W), "bias": f32(W)},
        "ln2": {"scale": f32(W), "bias": f32(W)},
        "attn": {"wqkv": f32(W, 3 * W), "bqkv": f32(3 * W),
                 "wo": f32(W, W), "bo": f32(W)},
        "mlp": {"w1": f32(W, M), "b1": f32(M), "w2": f32(M, W), "b2": f32(W)},
    }
    lora = {k: {"A": f32(i, 2), "B": f32(2, o)}
            for k, i, o in (("out_proj", W, W), ("c_fc", W, M), ("c_proj", M, W))}
    x = jnp.asarray(rng.standard_normal((2, S, W)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.zeros((S, S), jnp.float32)
    with pytest.raises(ValueError, match="VMEM budget"):
        text_block_fwd(x, mask, bp, lora, heads=H, scaling=2.0, interpret=True)


def test_chunked_block_kernels_match_unchunked():
    """The hidden-axis-chunked whole-block kernels (the wide-tower path) must
    reproduce the XLA composition's forward and gradients — same gates as the
    unchunked kernels, across chunk counts and image groups."""
    from aiic_tpu.ops.block_grad import text_block_bwd, text_block_fwd

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads

    y_ref = _ref_fwd(x, bp, lora, mask, heads, scaling)
    dy = jnp.cos(y_ref)  # the cotangent sum(sin(y)) would produce

    def loss_ref(x, lora):
        return jnp.sum(jnp.sin(_ref_fwd(x, bp, lora, mask, heads, scaling)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, lora)

    for plan in ((2, 2), (1, 4), (4, 2)):
        y_ker = text_block_fwd(x, mask, bp, lora, heads=heads,
                               scaling=scaling, interpret=True,
                               force_plan=plan)
        np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                                   atol=5e-6, err_msg=f"fwd plan={plan}")
        dx, dlora = text_block_bwd(x, dy, mask, bp, lora, heads=heads,
                                   scaling=scaling, interpret=True,
                                   force_plan=plan)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(gr[0]),
                                   atol=1e-5, err_msg=f"dx plan={plan}")
        for point in ("out_proj", "c_fc", "c_proj"):
            for fac in ("A", "B"):
                np.testing.assert_allclose(
                    np.asarray(dlora[point][fac]),
                    np.asarray(gr[1][point][fac]),
                    atol=1e-5, err_msg=f"{point}.{fac} plan={plan}")


def test_chunked_block_kernels_wide_tower_geometry():
    """Gradient parity at the ViT-L/14 text geometry itself (W=768, M=3072,
    H=12 — the tower the chunked path exists for). fp32 operands for tight
    tolerances with the planner bypassed (the real training dtype is bf16,
    whose planner outcome is asserted here; fp32's doubled residents have no
    plan at this width)."""
    from aiic_tpu.ops.block_grad import (
        text_block_bwd,
        text_block_fwd,
        text_block_plan,
    )

    S, W, M, H = 77, 768, 3072, 12
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(
        (0.05 * rng.standard_normal(s)).astype(np.float32))
    bp = {
        "ln1": {"scale": 1.0 + f32(W), "bias": f32(W)},
        "ln2": {"scale": 1.0 + f32(W), "bias": f32(W)},
        "attn": {"wqkv": f32(W, 3 * W), "bqkv": f32(3 * W),
                 "wo": f32(W, W), "bo": f32(W)},
        "mlp": {"w1": f32(W, M), "b1": f32(M), "w2": f32(M, W), "b2": f32(W)},
    }
    lora = {k: {"A": f32(i, 4), "B": f32(4, o)}
            for k, i, o in (("out_proj", W, W), ("c_fc", W, M),
                            ("c_proj", M, W))}
    x = jnp.asarray(rng.standard_normal((2, S, W)).astype(np.float32))
    mask = jnp.triu(jnp.full((S, S), -jnp.inf, jnp.float32), k=1)
    # bf16 (the training compute dtype) resolves to a chunked plan here —
    # this is the plan the trainer's block_fused path will take at L/14
    bf16_plan = text_block_plan(S, W, M, H, 2, bsz=2)
    assert bf16_plan is not None and bf16_plan[1] > 1
    plan = (bf16_plan[0] if 2 % bf16_plan[0] == 0 else 1, bf16_plan[1])

    y_ref = _ref_fwd(x, bp, lora, mask, H, 2.0)
    dy = jnp.cos(y_ref)

    def loss_ref(x, lora):
        return jnp.sum(jnp.sin(_ref_fwd(x, bp, lora, mask, H, 2.0)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, lora)

    y_ker = text_block_fwd(x, mask, bp, lora, heads=H, scaling=2.0,
                           interpret=True, force_plan=plan)
    # atol 2e-5 (not the TINY tests' 5e-6): chunking the M=3072 contraction
    # reorders the fp32 adds; measured reorder noise vs the reference is
    # <=1.1e-5 while chunked-vs-unchunked kernel agreement is <=3e-6.
    np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                               atol=2e-5)
    dx, dlora = text_block_bwd(x, dy, mask, bp, lora, heads=H, scaling=2.0,
                               interpret=True, force_plan=plan)
    # Two-level gradient gate. (1) chunked == UNCHUNKED kernel tightly: the
    # two share all numerics except the hidden-axis split, so this isolates
    # the chunking machinery itself. (2) kernel vs autodiff at a tolerance
    # honest about fp32 at this width: the kernel's exp2-softmax vs
    # jax.nn.softmax plus 154-row contractions give a measured ~1.2e-4 abs /
    # ~1.4e-3 rel deviation for the UNCHUNKED kernel too (exact math is
    # gated tightly at TINY geometry by the tests above).
    dx_u, dlora_u = text_block_bwd(x, dy, mask, bp, lora, heads=H,
                                   scaling=2.0, interpret=True,
                                   force_plan=(1, 1))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_u),
                               rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gr[0]),
                               rtol=2e-3, atol=3e-4)
    for point in ("out_proj", "c_fc", "c_proj"):
        for fac in ("A", "B"):
            np.testing.assert_allclose(
                np.asarray(dlora[point][fac]),
                np.asarray(dlora_u[point][fac]),
                rtol=1e-3, atol=5e-5, err_msg=f"{point}.{fac} vs unchunked")
            np.testing.assert_allclose(
                np.asarray(dlora[point][fac]), np.asarray(gr[1][point][fac]),
                rtol=2e-3, atol=3e-4, err_msg=f"{point}.{fac}")


def test_block_fused_under_mesh_trains():
    """make_train_step with attn_impl='block_fused' AND a mesh runs the
    kernel text tower inside a shard_map over ('data',) — a full sharded
    step must execute to a finite loss even when the caller does NOT ask
    shard_train_step to replicate the text weights (the shard_map's
    replicated in_specs then gather them)."""
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.parallel import create_mesh, shard_train_step
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    tc = TrainConfig(epochs=1, batch_size=8, rank=2, alpha=4,
                     attach=("c_fc", "c_proj", "out_proj"),
                     attn_impl="block_fused", image_attn_impl="xla")
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    lora = init_text_lora(jax.random.PRNGKey(1), CFG, LoRAConfig(2, 4, tc.attach))
    opt = make_optimizer(tc, steps_per_epoch=1)
    mesh = create_mesh(8, tp=2)
    ts, es = make_train_step(CFG, tc, opt, mesh=mesh)
    jt, _je, sp, sl, so = shard_train_step(mesh, ts, es, params, lora,
                                           opt.init(lora), replicate_visual=True)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal(
        (8, CFG.image_size, CFG.image_size, 3)).astype(np.float32))
    tokens = rng.integers(1, CFG.vocab_size - 2,
                          (8, CFG.context_length)).astype(np.int32)
    tokens[:, 0] = CFG.vocab_size - 2
    tokens[:, -1] = CFG.vocab_size - 1
    loss, _new_lora, _ = jt(sp, sl, so, pixels, jnp.asarray(tokens),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# int8 (serving-numerics) training kernels
# ---------------------------------------------------------------------------


def _quantized(bp):
    from aiic_tpu.ops.quant import quantize_weight

    wqkv_q, sqkv = quantize_weight(bp["attn"]["wqkv"])
    w1_q, s1 = quantize_weight(bp["mlp"]["w1"])
    w2_q, s2 = quantize_weight(bp["mlp"]["w2"])
    return {"wqkv_q": wqkv_q, "sqkv": sqkv,
            "w1_q": w1_q, "s1": s1, "w2_q": w2_q, "s2": s2}


def test_int8_block_forward_close_to_fp():
    """The int8 whole-block forward must stay >=0.999 cosine (and close
    row-wise) vs the fp composition — validates the scale algebra of every
    int8 matmul (a wrong dequant would produce garbage, not 0.999)."""
    from aiic_tpu.ops.block_grad import text_block_fwd_int8

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads
    qw = _quantized(bp)

    ref = np.asarray(_ref_fwd(x, bp, lora, mask, heads, scaling), np.float32)
    out = np.asarray(
        text_block_fwd_int8(x.astype(jnp.bfloat16), mask, bp, qw, lora,
                            heads=heads, scaling=scaling, interpret=True),
        np.float32)
    a, b = ref.reshape(-1, ref.shape[-1]), out.reshape(-1, out.shape[-1])
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.999, cos.min()


def test_int8_block_grads_close_to_bf16_path():
    """STE gradients through the int8 kernel must track the bf16-exact
    whole-block gradients closely (per-leaf cosine): quantization noise,
    not a different function."""
    from aiic_tpu.ops.block_grad import text_block_lora, text_block_lora_int8

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads
    qw = _quantized(bp)
    xb = x.astype(jnp.bfloat16)
    g = jnp.asarray(np.random.default_rng(3).standard_normal(x.shape)
                    .astype(np.float32))

    def loss_bf16(xx, lt):
        y = text_block_lora(xx, bp, lt, mask, heads, scaling, True)
        return (y.astype(jnp.float32) * g).sum()

    def loss_int8(xx, lt):
        y = text_block_lora_int8(xx, bp, qw, lt, mask, heads, scaling, True)
        return (y.astype(jnp.float32) * g).sum()

    (dx_a, dl_a) = jax.grad(loss_bf16, argnums=(0, 1))(xb, lora)
    (dx_b, dl_b) = jax.grad(loss_int8, argnums=(0, 1))(xb, lora)

    def cos(u, v):
        u = np.asarray(u, np.float32).ravel()
        v = np.asarray(v, np.float32).ravel()
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-12))

    assert cos(dx_a, dx_b) > 0.98, cos(dx_a, dx_b)
    for k in ("out_proj", "c_fc", "c_proj"):
        for f in ("A", "B"):
            c = cos(dl_a[k][f], dl_b[k][f])
            assert c > 0.98, (k, f, c)


def test_quantize_text_train_step_runs_and_trains():
    """TrainConfig(quantize_text=True) routes the text tower through the
    int8 whole-block kernel (clip.block 'block_fused_int8') and a full
    train step produces finite loss + adapter movement."""
    from aiic_tpu.adapters import LoRAConfig, init_text_lora
    from aiic_tpu.ops.quant import quantize_model_mlp
    from aiic_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    tc = TrainConfig(epochs=1, batch_size=4, rank=2, alpha=4,
                     attach=("c_fc", "c_proj", "out_proj"),
                     attn_impl="block_fused", quantize_text=True,
                     image_attn_impl="xla", dtype=jnp.bfloat16)
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    params = quantize_model_mlp(params, attn=True, towers=("text",))
    lora = init_text_lora(jax.random.PRNGKey(1), CFG, LoRAConfig(2, 4, tc.attach))
    lora_before = jax.tree.map(np.asarray, lora)
    opt = make_optimizer(tc, steps_per_epoch=1)
    ts, _es = make_train_step(CFG, tc, opt)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal(
        (4, CFG.image_size, CFG.image_size, 3)).astype(np.float32))
    tokens = rng.integers(1, CFG.vocab_size - 2,
                          (4, CFG.context_length)).astype(np.int32)
    tokens[:, 0] = CFG.vocab_size - 2
    tokens[:, -1] = CFG.vocab_size - 1
    loss, new_lora, _ = jax.jit(ts)(params, lora, opt.init(lora), pixels,
                                    jnp.asarray(tokens), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    moved = any(
        np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max() > 0
        for a, b in zip(jax.tree.leaves(lora_before), jax.tree.leaves(new_lora)))
    assert moved


def test_block_fused_int8_routing_falls_back_without_qweights():
    """attn_impl='block_fused_int8' without attn_q/mlp_q in the params tree
    must fall back to the bf16 whole-block kernel (same output)."""
    from aiic_tpu.models.clip import block

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads
    xb = x.astype(jnp.bfloat16)
    a = block(xb, bp, heads, mask, "quick_gelu", lora=lora,
              lora_scaling=scaling, attn_impl="block_fused")
    b = block(xb, bp, heads, mask, "quick_gelu", lora=lora,
              lora_scaling=scaling, attn_impl="block_fused_int8")
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


# ---------------------------------------------------------------------------
# hidden-axis-chunked int8 kernels (the L/14-class wide-tower path)
# ---------------------------------------------------------------------------


def test_chunked_int8_forward_matches_unchunked():
    """The two-pass chunked int8 forward must reproduce the unchunked
    serving numerics: identical h2/u quantization grids (global per-row u
    scale via the pass boundary) and an int32 c_proj accumulator that is
    bit-equal by associativity — only fp32 summation order in the LoRA side
    terms may drift (ulp-level)."""
    from aiic_tpu.ops.block_grad import text_block_fwd_int8

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads
    qw = _quantized(bp)
    xb = x.astype(jnp.bfloat16)
    kw = dict(heads=heads, scaling=scaling, interpret=True)
    ref = np.asarray(
        text_block_fwd_int8(xb, mask, bp, qw, lora, force_plan=(2, 1), **kw),
        np.float32)
    for plan in [(2, 2), (1, 4), (4, 2)]:
        out = np.asarray(
            text_block_fwd_int8(xb, mask, bp, qw, lora, force_plan=plan,
                                **kw), np.float32)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0,
                                   err_msg=str(plan))


def test_chunked_int8_grads_close_to_unchunked():
    """Chunked int8 backward vs unchunked: the c_fc/c_proj LoRA cotangents
    and the STE path through c_proj are exact reproductions (identical
    quantization grids); dx and the out_proj cotangents differ only through
    the per-(row, chunk) c_fc cotangent quantization — within the STE noise
    floor the int8 kernels are already gated at."""
    from aiic_tpu.ops.block_grad import text_block_bwd_int8

    bp, lora, x, mask, scaling = _setup()
    heads = CFG.text.heads
    qw = _quantized(bp)
    xb = x.astype(jnp.bfloat16)
    dy = jnp.asarray(np.random.default_rng(7).standard_normal(x.shape)
                     .astype(np.float32)).astype(jnp.bfloat16)
    kw = dict(heads=heads, scaling=scaling, interpret=True)
    dx_ref, dl_ref = text_block_bwd_int8(xb, dy, mask, bp, qw, lora,
                                         force_plan=(2, 1), **kw)

    def cos(u, v):
        u = np.asarray(u, np.float32).ravel()
        v = np.asarray(v, np.float32).ravel()
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-12))

    for plan in [(2, 2), (1, 4)]:
        dx_c, dl_c = text_block_bwd_int8(xb, dy, mask, bp, qw, lora,
                                         force_plan=plan, **kw)
        # chunk-local cotangents: exact reproductions
        for k, f in (("c_fc", "A"), ("c_fc", "B"),
                     ("c_proj", "A"), ("c_proj", "B")):
            np.testing.assert_allclose(
                np.asarray(dl_c[k][f], np.float32),
                np.asarray(dl_ref[k][f], np.float32),
                atol=1e-4, rtol=1e-4, err_msg=(plan, k, f))
        # paths crossing the per-chunk dfq quantization: cosine-gated
        assert cos(dx_c, dx_ref) > 0.99, (plan, cos(dx_c, dx_ref))
        for f in ("A", "B"):
            c = cos(dl_c["out_proj"][f], dl_ref["out_proj"][f])
            assert c > 0.99, (plan, f, c)


def test_int8_plan_geometry():
    """The int8 planner: B/16-class towers stay on the unchunked serving
    composition; L/14-class towers (whose unchunked kernel measured 17.57 MB
    in-scan against the 16 MB ceiling) get a lane-aligned chunked plan; the
    trainer gate therefore accepts quantize_text at both geometries."""
    from aiic_tpu.ops.block_grad import (
        text_block_int8_plan,
        text_block_int8_supported,
    )

    assert text_block_int8_plan(77, 512, 2048, 8) == (2, 1)
    plan = text_block_int8_plan(77, 768, 3072, 12)
    assert plan is not None and plan[1] > 1, plan
    assert (3072 // plan[1]) % 128 == 0, plan
    assert text_block_int8_supported(77, 768, 3072, 12)
    assert text_block_int8_supported(77, 512, 2048, 8)
