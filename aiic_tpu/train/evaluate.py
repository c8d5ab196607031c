"""Adapter evaluation: in-batch contrastive retrieval accuracy.

Reference ``test_trained_lora`` (train_lora.py:309-360): batches of
(image, random-prompt) pairs, predictions = argmax over the batch similarity
matrix, accuracy vs the diagonal.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.adapters import LoRAConfig, lora_tree_from_pth
from aiic_tpu.data.dataset import load_training_data
from aiic_tpu.models.clip import encode_image, encode_text, normalize_features
from aiic_tpu.models.config import CLIPConfig, VIT_B_16


def test_trained_lora(
    json_path: str,
    lora_weights_path: str,
    *,
    params: Optional[Dict[str, Any]] = None,
    config: CLIPConfig = VIT_B_16,
    rank: int = 16,
    alpha: int = 32,
    batch_size: int = 8,
    image_root: Optional[str] = None,
    seed: int = 0,
) -> float:
    """Returns retrieval accuracy in [0, 1]."""
    import os

    from aiic_tpu.models.init import init_clip_params
    from aiic_tpu.train.trainer import PromptedImageDataset

    if params is None:
        params = init_clip_params(jax.random.PRNGKey(seed), config)
    lc = LoRAConfig(rank=rank, alpha=alpha, attach=("c_fc", "c_proj", "out_proj"))
    lora_tree, _ = lora_tree_from_pth(lora_weights_path, config, lc, seed=seed)

    if image_root is None:
        image_root = os.path.dirname(os.path.abspath(json_path))
    ds = PromptedImageDataset(load_training_data(json_path), config, image_root=image_root)
    rng = np.random.default_rng(seed)

    # params/lora must be jit *arguments*: closing over them would bake
    # hundreds of MB of weights into the HLO as constants (pathological
    # compile time, especially through a remote compiler).
    @jax.jit
    def sim_matrix(params, lora_tree, pixels, tokens):
        img = normalize_features(encode_image(params, pixels, config))
        txt = normalize_features(
            encode_text(params, tokens, config, lora=lora_tree, lora_scaling=lc.scaling)
        )
        return jnp.exp(params["logit_scale"]) * img @ txt.T

    correct = total = 0
    idx = np.arange(len(ds))
    for i in range(0, len(idx) - 1, batch_size):
        sl = idx[i : i + batch_size]
        if len(sl) < 2:
            continue
        pixels, tokens = ds.batch(sl, rng)
        sims = np.asarray(
            sim_matrix(params, lora_tree, jnp.asarray(pixels), jnp.asarray(tokens))
        )
        correct += int((sims.argmax(axis=1) == np.arange(len(sl))).sum())
        total += len(sl)
    return correct / max(total, 1)
