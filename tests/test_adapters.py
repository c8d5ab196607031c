"""LoRA checkpoint converter tests against the real reference checkpoints."""

import os

import jax
import numpy as np
import pytest

from aiic_tpu.adapters import LoRAConfig, lora_tree_from_pth, lora_tree_to_pth_dict
from aiic_tpu.adapters.torch_convert import parse_lora_key
from aiic_tpu.models.config import VIT_B_16

CKPT = "/root/reference/lora_models/comprehensive_lora.pth"
CKPT2 = "/root/reference/lora_models/comprehensive_lora_new.pth"


def test_parse_lora_key():
    assert parse_lora_key(
        "clip_model.transformer.resblocks.3.mlp.c_fc.lora.lora_A"
    ) == ("text", 3, "c_fc", "A")
    assert parse_lora_key(
        "transformer.resblocks.11.attn.out_proj.lora.lora_B"
    ) == ("text", 11, "out_proj", "B")
    assert parse_lora_key(
        "visual.transformer.resblocks.0.mlp.c_proj.lora.lora_A"
    ) == ("visual", 0, "c_proj", "A")
    assert parse_lora_key("token_embedding.weight") is None


@pytest.mark.parametrize("path", [CKPT, CKPT2])
def test_pth_roundtrip_bit_faithful(path):
    if not os.path.exists(path):
        pytest.skip("reference checkpoint not available")
    import torch

    lc = LoRAConfig(rank=4, alpha=8, attach=("c_fc", "c_proj"))
    tree, meta = lora_tree_from_pth(path, VIT_B_16, lc)
    assert meta["loaded"] == 48 and not meta["skipped"]

    back = lora_tree_to_pth_dict(tree)
    orig = torch.load(path, map_location="cpu", weights_only=True)
    assert set(back.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k].numpy(), err_msg=k)


def test_missing_adapters_are_noops():
    """A checkpoint covering only some attach points leaves the rest at B=0."""
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint not available")
    lc = LoRAConfig(rank=4, alpha=8, attach=("c_fc", "c_proj", "out_proj"))
    tree, meta = lora_tree_from_pth(CKPT, VIT_B_16, lc)
    assert meta["loaded"] == 48
    np.testing.assert_array_equal(np.asarray(tree["out_proj"]["B"]), 0.0)
    assert np.abs(np.asarray(tree["c_fc"]["B"])).max() > 0  # trained weights


def test_rank_mismatch_raises():
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint not available")
    lc = LoRAConfig(rank=16, alpha=32, attach=("c_fc", "c_proj"))
    with pytest.raises(ValueError):
        lora_tree_from_pth(CKPT, VIT_B_16, lc)


def test_infer_lora_rank():
    from aiic_tpu.adapters.torch_convert import infer_lora_rank

    if os.path.exists(CKPT):
        assert infer_lora_rank(CKPT) == 4  # shipped reference checkpoints
    fake = {
        "clip_model.transformer.resblocks.0.mlp.c_fc.lora.lora_A": np.zeros((512, 16)),
        "clip_model.transformer.resblocks.0.mlp.c_fc.lora.lora_B": np.zeros((16, 2048)),
    }
    assert infer_lora_rank(fake) == 16  # this repo's train-lora default
    assert infer_lora_rank({"token_embedding.weight": np.zeros((2, 2))}) is None
