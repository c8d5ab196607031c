"""Model-core tests: shapes, LoRA algebra, fold/threaded equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiic_tpu.adapters import LoRAConfig, fold_text_lora, init_text_lora, lora_param_count
from aiic_tpu.models import (
    TINY_TEST,
    clip_forward,
    encode_image,
    encode_text,
    init_clip_params,
    normalize_features,
)

CFG = TINY_TEST


@pytest.fixture(scope="module")
def params():
    return init_clip_params(jax.random.PRNGKey(0), CFG)


def _tokens(n=3):
    tok = np.zeros((n, CFG.context_length), np.int32)
    tok[:, 0] = CFG.vocab_size - 2
    tok[:, 5] = CFG.vocab_size - 1
    return jnp.asarray(tok)


def test_shapes(params):
    px = jax.random.uniform(jax.random.PRNGKey(1), (2, CFG.image_size, CFG.image_size, 3))
    img = encode_image(params, px, CFG)
    txt = encode_text(params, _tokens(), CFG)
    assert img.shape == (2, CFG.embed_dim)
    assert txt.shape == (3, CFG.embed_dim)
    li, lt = clip_forward(params, px, _tokens(), CFG)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-6)


def test_normalize():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    n = normalize_features(x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, rtol=1e-6)


def test_lora_zero_b_is_noop(params):
    lc = LoRAConfig(rank=2, alpha=4, attach=("c_fc", "c_proj", "out_proj"))
    tree = init_text_lora(jax.random.PRNGKey(2), CFG, lc)
    base = encode_text(params, _tokens(), CFG)
    with_lora = encode_text(params, _tokens(), CFG, lora=tree, lora_scaling=lc.scaling)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


@pytest.mark.parametrize("attach", [("c_fc",), ("c_proj",), ("out_proj",), ("c_fc", "c_proj", "out_proj")])
def test_fold_equals_threaded(params, attach):
    lc = LoRAConfig(rank=2, alpha=4, attach=attach)
    tree = init_text_lora(jax.random.PRNGKey(2), CFG, lc)
    # Make B nonzero with *random* values: a constant B would produce a
    # feature-uniform delta that the next LayerNorm cancels exactly.
    keys = iter(jax.random.split(jax.random.PRNGKey(7), len(jax.tree.leaves(tree))))
    tree = jax.tree.map(lambda x: x + 0.05 * jax.random.normal(next(keys), x.shape), tree)
    threaded = encode_text(params, _tokens(), CFG, lora=tree, lora_scaling=lc.scaling)
    folded = encode_text(fold_text_lora(params, tree, lc.scaling), _tokens(), CFG)
    np.testing.assert_allclose(np.asarray(threaded), np.asarray(folded), atol=1e-4)
    # and it is NOT a no-op
    base = encode_text(params, _tokens(), CFG)
    assert np.abs(np.asarray(base) - np.asarray(threaded)).max() > 1e-4


def test_lora_scaling_matches_reference_rule():
    # rank=4/alpha=8 (main.py:522) and rank=16/alpha=32 (train_lora.py:370-371)
    # both produce scaling 2.0.
    assert LoRAConfig(rank=4, alpha=8).scaling == 2.0
    assert LoRAConfig(rank=16, alpha=32).scaling == 2.0


def test_lora_param_count_matches_checkpoint_geometry():
    # Reference shipped checkpoints: 245,760 params over 12 text blocks,
    # rank 4, c_fc/c_proj only (SURVEY.md §2c).
    from aiic_tpu.models.config import VIT_B_16

    lc = LoRAConfig(rank=4, alpha=8, attach=("c_fc", "c_proj"))
    tree = init_text_lora(jax.random.PRNGKey(0), VIT_B_16, lc)
    assert lora_param_count(tree) == 245760


def test_eot_pooling_uses_argmax(params):
    tok = np.zeros((1, CFG.context_length), np.int32)
    tok[:, 0] = CFG.vocab_size - 2
    tok[:, 3] = CFG.vocab_size - 1  # EOT earlier in the sequence
    a = encode_text(params, jnp.asarray(tok), CFG)
    tok2 = tok.copy()
    tok2[:, 10] = 7  # tokens after EOT must not change the pooled output
    b = encode_text(params, jnp.asarray(tok2), CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vit_b_32_preset_initializes():
    from aiic_tpu.models.config import VIT_B_32 as cfg

    p = init_clip_params(jax.random.PRNGKey(0), cfg)
    assert p["visual"]["blocks"]["mlp"]["w1"].shape == (
        cfg.vision.layers, cfg.vision.width, cfg.vision.mlp_dim
    )
    assert p["visual"]["pos"].shape == (cfg.vision_seq_len, cfg.vision.width)
    assert p["text"]["proj"].shape == (cfg.text.width, cfg.embed_dim)
    assert p["visual"]["patch_embed"].shape == (
        3 * cfg.patch_size * cfg.patch_size, cfg.vision.width
    )


def test_vit_l_14_config_math():
    # full init is ~430M params — too slow for a 1-core CI; check geometry only
    from aiic_tpu.models.config import VIT_L_14 as cfg

    assert cfg.vision.width == 1024 and cfg.vision.layers == 24
    assert cfg.grid_size == 16 and cfg.vision_seq_len == 257
    assert cfg.embed_dim == 768 and cfg.text.width == 768


def test_vit_l_14_336_config_math():
    # OpenAI's L/14@336px: same towers, 336 input -> 24x24 grid, S=577
    from aiic_tpu.models.config import VIT_L_14, VIT_L_14_336 as cfg

    assert cfg.vision == VIT_L_14.vision and cfg.text == VIT_L_14.text
    assert cfg.image_size == 336 and cfg.grid_size == 24
    assert cfg.vision_seq_len == 577
    assert cfg.embed_dim == VIT_L_14.embed_dim


def test_structured_logging(capsys):
    import os

    os.environ["AIIC_LOG_JSON"] = "1"
    try:
        import importlib, logging

        from aiic_tpu.utils import logging as alog

        logger = alog.get_logger("aiic-test")
        alog.log_event(logger, "batch done", images=4, ms=12.5)
        err = capsys.readouterr().err
        import json as _json

        rec = _json.loads(err.strip().splitlines()[-1])
        assert rec["msg"] == "batch done" and rec["images"] == 4
    finally:
        os.environ.pop("AIIC_LOG_JSON", None)


def test_remat_matches_no_remat(params):
    from aiic_tpu.models.clip import causal_mask, run_tower

    x = jax.random.normal(jax.random.PRNGKey(4), (2, CFG.context_length, CFG.text.width))
    mask = causal_mask(CFG.context_length)
    a = run_tower(x, params["text"]["blocks"], CFG.text.heads, mask, CFG.gelu_type)
    b = run_tower(x, params["text"]["blocks"], CFG.text.heads, mask, CFG.gelu_type, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cls_last_block_is_exact(params, monkeypatch):
    """The CLS-row specialization of the final image block (block_cls) is an
    exact restriction of the uniform scan: the pooled output depends only on
    the last block's CLS row, so enabling it must reproduce the full-tower
    features to float tolerance on the fp32 XLA path."""
    px = jax.random.uniform(
        jax.random.PRNGKey(3), (2, CFG.image_size, CFG.image_size, 3))
    monkeypatch.setenv("AIIC_CLS_LAST", "0")
    full = np.asarray(encode_image(params, px, CFG))
    monkeypatch.setenv("AIIC_CLS_LAST", "1")
    fast = np.asarray(encode_image(params, px, CFG))
    np.testing.assert_allclose(fast, full, rtol=2e-5, atol=2e-5)


def test_cls_last_block_pallas_serving_path(params, monkeypatch):
    """CLS-last under the serving kernel config (bf16 + pallas, interpret):
    the first N-1 blocks run the fused kernels, the last block runs the
    bf16 block_cls — output must track the uniform fp32 tower within bf16
    tolerance."""
    px = jax.random.uniform(
        jax.random.PRNGKey(4), (2, CFG.image_size, CFG.image_size, 3))
    monkeypatch.setenv("AIIC_CLS_LAST", "0")
    ref = np.asarray(encode_image(params, px, CFG))
    monkeypatch.setenv("AIIC_CLS_LAST", "1")
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    got = np.asarray(
        encode_image(p16, px.astype(jnp.bfloat16), CFG,
                     dtype=jnp.bfloat16, attn_impl="pallas")
    ).astype(np.float32)
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.999
