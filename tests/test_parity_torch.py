"""Numerics parity vs a torch CLIP oracle.

No pretrained weights exist in this zero-egress environment, so parity is
proven structurally: build a random-weight torch ``transformers.CLIPModel``
with the exact ViT-B/16 geometry the reference uses, convert its weights into
this framework, and require ≥0.999 logit agreement (the BASELINE.md bar) on
random images and texts. With real OpenAI weights the same converter path
(``from_openai_clip_state_dict``) applies unchanged.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from aiic_tpu.models import VIT_B_16, encode_image, encode_text, normalize_features
from aiic_tpu.models.init import (
    from_hf_clip_state_dict,
    from_openai_clip_state_dict,
)


def _hf_vit_b16():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "hidden_size": 512,
            "intermediate_size": 2048,
            "num_hidden_layers": 12,
            "num_attention_heads": 8,
            "max_position_embeddings": 77,
            "vocab_size": 49408,
            "hidden_act": "quick_gelu",
            "eos_token_id": 49407,
        },
        vision_config={
            "hidden_size": 768,
            "intermediate_size": 3072,
            "num_hidden_layers": 12,
            "num_attention_heads": 12,
            "image_size": 224,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=512,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def oracle():
    model = _hf_vit_b16()
    params = from_hf_clip_state_dict(model.state_dict(), VIT_B_16)
    return model, params


def _rand_inputs(batch=2, n_text=3, seed=0):
    rng = np.random.default_rng(seed)
    pixels = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
    tokens = rng.integers(1, 40000, size=(n_text, 77), dtype=np.int64)
    tokens[:, 0] = 49406
    eot_pos = rng.integers(5, 76, size=n_text)
    for i, p in enumerate(eot_pos):
        tokens[i, p] = 49407
        tokens[i, p + 1 :] = 0
    return pixels, tokens


def test_image_tower_parity(oracle):
    model, params = oracle
    pixels, _ = _rand_inputs()
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        ).numpy()
    ours = np.asarray(encode_image(params, pixels, VIT_B_16))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_text_tower_parity(oracle):
    model, params = oracle
    _, tokens = _rand_inputs()
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()
    ours = np.asarray(encode_text(params, tokens.astype(np.int32), VIT_B_16))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_logit_agreement_at_baseline_bar(oracle):
    """BASELINE.md: ≥0.999 logit agreement. Measured as cosine similarity of
    the 100·img@text.T logit matrices (the quantity the reference thresholds,
    main.py:208)."""
    model, params = oracle
    pixels, tokens = _rand_inputs(batch=4, n_text=8, seed=1)
    with torch.no_grad():
        rimg = model.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        )
        rtxt = model.get_text_features(input_ids=torch.from_numpy(tokens))
        rimg = rimg / rimg.norm(dim=-1, keepdim=True)
        rtxt = rtxt / rtxt.norm(dim=-1, keepdim=True)
        ref_logits = (100.0 * rimg @ rtxt.T).numpy()

    oimg = normalize_features(encode_image(params, pixels, VIT_B_16))
    otxt = normalize_features(encode_text(params, tokens.astype(np.int32), VIT_B_16))
    our_logits = np.asarray(100.0 * oimg @ otxt.T)

    a, b = our_logits.ravel(), ref_logits.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos >= 0.999, cos
    np.testing.assert_allclose(our_logits, ref_logits, atol=5e-3)


def test_full_pipeline_detector_parity_on_real_images(oracle, ref_root):
    """BASELINE configs #1/#2 shape: real JPEGs through the full pipeline
    (PIL preprocess -> encode -> 40-category softmax rule) must produce the
    same probabilities and verdicts in both frameworks."""
    import glob

    from PIL import Image

    from aiic_tpu.data.preprocess import preprocess_pil
    from aiic_tpu.data.tokenizer import tokenize
    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.engine.programs import detect_logits

    model, params = oracle
    paths = sorted(glob.glob(f"{ref_root}/dataset_images/*.jpg"))[:6]
    paths.append(f"{ref_root}/interior_sample.jpg")
    pixels = np.stack([preprocess_pil(Image.open(p)) for p in paths])
    tokens = tokenize(DETECTOR_CATEGORIES).astype(np.int64)

    with torch.no_grad():
        rimg = model.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        )
        rtxt = model.get_text_features(input_ids=torch.from_numpy(tokens))
        rimg = rimg / rimg.norm(dim=-1, keepdim=True)
        rtxt = rtxt / rtxt.norm(dim=-1, keepdim=True)
        ref_probs = (100.0 * rimg @ rtxt.T).softmax(dim=-1).numpy()

    oimg = normalize_features(encode_image(params, pixels, VIT_B_16))
    otxt = normalize_features(encode_text(params, tokens.astype(np.int32), VIT_B_16))
    out = jax.tree.map(np.asarray, detect_logits(oimg, otxt, INTERIOR_COUNT))

    np.testing.assert_allclose(
        out["interior_mass"], ref_probs[:, :INTERIOR_COUNT].sum(-1), atol=1e-3
    )
    # verdict parity at the reference threshold (main.py:208-220)
    ref_verdict = (
        (ref_probs[:, :INTERIOR_COUNT].sum(-1) > ref_probs[:, INTERIOR_COUNT:].sum(-1))
        & (ref_probs.max(-1) > 0.3)
    )
    our_verdict = (out["interior_mass"] > out["non_interior_mass"]) & (out["top_conf"] > 0.3)
    np.testing.assert_array_equal(our_verdict, ref_verdict)
    np.testing.assert_array_equal(out["top_idx"], ref_probs.argmax(-1))


def test_serving_config_compound_parity(oracle, ref_root):
    """The EXACT bench.py/worker serving configuration — bf16 compute +
    Pallas kernels + int8 MLP and attention-projection weights, all errors
    compounded — must stay >=0.999 logit cosine vs the fp32 torch oracle on
    real reference images (BASELINE.md agreement bar; reference rule
    main.py:208-220)."""
    import glob

    import jax.numpy as jnp
    from PIL import Image

    from aiic_tpu.data.preprocess import preprocess_pil
    from aiic_tpu.data.tokenizer import tokenize
    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.ops.quant import quantize_model

    model, params = oracle
    paths = sorted(glob.glob(f"{ref_root}/dataset_images/*.jpg"))[:4]
    if not paths:
        pytest.skip("reference images not available")
    pixels = np.stack([preprocess_pil(Image.open(p)) for p in paths])
    tokens = tokenize(DETECTOR_CATEGORIES).astype(np.int64)

    with torch.no_grad():
        rimg = model.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        )
        rtxt = model.get_text_features(input_ids=torch.from_numpy(tokens))
        rimg = rimg / rimg.norm(dim=-1, keepdim=True)
        rtxt = rtxt / rtxt.norm(dim=-1, keepdim=True)
        ref_logits = (100.0 * rimg @ rtxt.T).numpy()
        ref_probs = torch.from_numpy(ref_logits).softmax(dim=-1).numpy()

    qparams = quantize_model(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    )
    oimg = normalize_features(encode_image(
        qparams, pixels, VIT_B_16, dtype=jnp.bfloat16, attn_impl="pallas"
    ))
    otxt = normalize_features(encode_text(
        qparams, tokens.astype(np.int32), VIT_B_16,
        dtype=jnp.bfloat16, attn_impl="pallas",
    ))
    our_logits = np.asarray(100.0 * oimg @ otxt.T)

    a, b = our_logits.ravel(), ref_logits.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos >= 0.999, f"serving-config logit cosine {cos} below bar"

    our_probs = np.exp(our_logits - our_logits.max(-1, keepdims=True))
    our_probs /= our_probs.sum(-1, keepdims=True)
    ref_verdict = (
        (ref_probs[:, :INTERIOR_COUNT].sum(-1) > ref_probs[:, INTERIOR_COUNT:].sum(-1))
        & (ref_probs.max(-1) > 0.3)
    )
    our_verdict = (
        (our_probs[:, :INTERIOR_COUNT].sum(-1) > our_probs[:, INTERIOR_COUNT:].sum(-1))
        & (our_probs.max(-1) > 0.3)
    )
    np.testing.assert_array_equal(our_verdict, ref_verdict)


def _openai_sd_from_hf(sd, vision_layers=12, text_layers=12):
    """Rebuild the OpenAI ``clip``-package state-dict layout from HF weights
    (the transformation the two converters must agree about)."""
    openai_sd = {}

    def put_tower(hf_prefix, oa_prefix, layers):
        for i in range(layers):
            h = f"{hf_prefix}.encoder.layers.{i}"
            o = f"{oa_prefix}.resblocks.{i}"
            openai_sd[f"{o}.attn.in_proj_weight"] = torch.cat(
                [sd[f"{h}.self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], dim=0
            )
            openai_sd[f"{o}.attn.in_proj_bias"] = torch.cat(
                [sd[f"{h}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], dim=0
            )
            openai_sd[f"{o}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
            openai_sd[f"{o}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
            openai_sd[f"{o}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
            openai_sd[f"{o}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
            openai_sd[f"{o}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
            openai_sd[f"{o}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
            openai_sd[f"{o}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
            openai_sd[f"{o}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
            openai_sd[f"{o}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
            openai_sd[f"{o}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]

    put_tower("vision_model", "visual.transformer", vision_layers)
    put_tower("text_model", "transformer", text_layers)
    openai_sd["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    openai_sd["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    openai_sd["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    openai_sd["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    openai_sd["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    openai_sd["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    openai_sd["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    openai_sd["visual.proj"] = sd["visual_projection.weight"].t().contiguous()
    openai_sd["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    openai_sd["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    openai_sd["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    openai_sd["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    openai_sd["text_projection"] = sd["text_projection.weight"].t().contiguous()
    openai_sd["logit_scale"] = sd["logit_scale"]
    return openai_sd


def test_openai_layout_converter_consistent_with_hf(oracle):
    """Build the OpenAI ``clip``-package state dict layout from the same HF
    weights and require both converters to produce identical pytrees."""
    model, params_hf = oracle
    openai_sd = _openai_sd_from_hf(model.state_dict())

    params_oa = from_openai_clip_state_dict(openai_sd, VIT_B_16)
    flat_hf = jax.tree.leaves(params_hf)
    flat_oa = jax.tree.leaves(params_oa)
    assert len(flat_hf) == len(flat_oa)
    for a, b in zip(flat_hf, flat_oa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converters_agree_at_vit_l14_geometry():
    """Both weight converters at ViT-L/14 geometry (asymmetric towers:
    vision 1024x24 H=16 patch-14 / text 768x12 H=12, 768-dim projection) —
    the scale the 'model' mesh axis exists for. Catches any residual
    ViT-B/16 assumptions (per-tower layer counts, head splits, S=257
    position table) in from_hf/from_openai. Converter-level only: the L/14
    forward pass is exercised by the sharded-encode tests in
    tests/test_parallel.py."""
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    from aiic_tpu.models.config import VIT_L_14

    cfg = HFCLIPConfig(
        text_config={
            "hidden_size": 768,
            "intermediate_size": 3072,
            "num_hidden_layers": 12,
            "num_attention_heads": 12,
            "max_position_embeddings": 77,
            "vocab_size": 49408,
            "hidden_act": "quick_gelu",
            "eos_token_id": 49407,
        },
        vision_config={
            "hidden_size": 1024,
            "intermediate_size": 4096,
            "num_hidden_layers": 24,
            "num_attention_heads": 16,
            "image_size": 224,
            "patch_size": 14,
            "hidden_act": "quick_gelu",
        },
        projection_dim=768,
    )
    torch.manual_seed(1)
    model = CLIPModel(cfg).eval()
    sd = model.state_dict()

    params_hf = from_hf_clip_state_dict(sd, VIT_L_14)
    # stacked-tower shapes at L/14 geometry
    vb = params_hf["visual"]["blocks"]
    assert vb["attn"]["wqkv"].shape == (24, 1024, 3072)
    assert vb["mlp"]["w1"].shape == (24, 1024, 4096)
    assert params_hf["visual"]["pos"].shape[0] == VIT_L_14.vision_seq_len  # 257
    assert params_hf["text"]["blocks"]["attn"]["wqkv"].shape == (12, 768, 2304)
    assert params_hf["visual"]["proj"].shape == (1024, 768)

    params_oa = from_openai_clip_state_dict(
        _openai_sd_from_hf(sd, vision_layers=24, text_layers=12), VIT_L_14)
    flat_hf = jax.tree.leaves(params_hf)
    flat_oa = jax.tree.leaves(params_oa)
    assert len(flat_hf) == len(flat_oa)
    for a, b in zip(flat_hf, flat_oa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_clip_weights_from_hf_directory(oracle, tmp_path):
    """HF checkpoint-directory loading (safetensors) must round-trip."""
    pytest.importorskip("safetensors")
    model, params = oracle
    d = tmp_path / "hf_ckpt"
    model.save_pretrained(str(d), safe_serialization=True)

    from aiic_tpu.models.init import load_clip_weights

    loaded = load_clip_weights(str(d), VIT_B_16)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_clip_weights_from_openai_pt(oracle, tmp_path):
    """OpenAI clip-layout .pt file autodetection via load_clip_weights."""
    import torch

    model, params = oracle
    # minimal openai-layout dict marker: loader keys off visual.conv1.weight;
    # reuse the converter consistency fixture path instead of rebuilding here.
    sd = model.state_dict()
    openai_sd = {"visual.conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"]}
    # full layout is covered by test_openai_layout_converter_consistent_with_hf;
    # here just assert the dispatch raises KeyError on the partial dict (it
    # chose the OpenAI branch) rather than silently using the HF branch.
    from aiic_tpu.models.init import load_clip_weights

    p = tmp_path / "partial.pt"
    torch.save(openai_sd, str(p))
    with pytest.raises(KeyError):
        load_clip_weights(str(p), VIT_B_16)
