"""Parameter initialization and weight import.

``init_clip_params`` follows the OpenAI CLIP initialization scheme (normal
inits with width-scaled std, zero biases, logit_scale = ln(1/0.07)) so a
randomly initialized model is trainable out of the box.

``from_torch_clip_state_dict`` / ``from_hf_clip_state_dict`` convert real
weights (OpenAI ``clip`` package layout, or HuggingFace ``CLIPModel`` layout)
into this framework's pytree. The HF path doubles as the numerics oracle in
tests: build a random torch CLIPModel offline, convert, and require logit
agreement.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.models.config import CLIPConfig

Params = Dict[str, Any]


def _ln(width: int) -> Params:
    return {"scale": jnp.ones((width,), jnp.float32), "bias": jnp.zeros((width,), jnp.float32)}


def _init_tower_blocks(key, layers: int, width: int, mlp_dim: int) -> Params:
    """Stacked (leading layer axis) block params, OpenAI CLIP init scheme."""
    ks = jax.random.split(key, 4)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "ln1": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "ln2": {"scale": jnp.ones((layers, width)), "bias": jnp.zeros((layers, width))},
        "attn": {
            "wqkv": jax.random.normal(ks[0], (layers, width, 3 * width)) * attn_std,
            "bqkv": jnp.zeros((layers, 3 * width)),
            "wo": jax.random.normal(ks[1], (layers, width, width)) * proj_std,
            "bo": jnp.zeros((layers, width)),
        },
        "mlp": {
            "w1": jax.random.normal(ks[2], (layers, width, mlp_dim)) * fc_std,
            "b1": jnp.zeros((layers, mlp_dim)),
            "w2": jax.random.normal(ks[3], (layers, mlp_dim, width)) * proj_std,
            "b2": jnp.zeros((layers, width)),
        },
    }


def init_clip_params(key: jax.Array, config: CLIPConfig) -> Params:
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    vw, tw = config.vision.width, config.text.width
    patch_dim = 3 * config.patch_size * config.patch_size
    vscale = vw ** -0.5
    tscale = tw ** -0.5
    params = {
        "visual": {
            "patch_embed": jax.random.normal(k1, (patch_dim, vw)) * vscale,
            "cls": jax.random.normal(k2, (vw,)) * vscale,
            "pos": jax.random.normal(k3, (config.vision_seq_len, vw)) * vscale,
            "ln_pre": _ln(vw),
            "blocks": _init_tower_blocks(kv, config.vision.layers, vw, config.vision.mlp_dim),
            "ln_post": _ln(vw),
            "proj": jax.random.normal(k4, (vw, config.embed_dim)) * vscale,
        },
        "text": {
            "tok_embed": jax.random.normal(k5, (config.vocab_size, tw)) * 0.02,
            "pos": jax.random.normal(kt, (config.context_length, tw)) * 0.01,
            "blocks": _init_tower_blocks(kt, config.text.layers, tw, config.text.mlp_dim),
            "ln_final": _ln(tw),
            "proj": jax.random.normal(kt, (tw, config.embed_dim)) * tscale,
        },
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


# ---------------------------------------------------------------------------
# Torch-weight import
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host-side, no torch import)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _stack(arrs) -> jnp.ndarray:
    return jnp.asarray(np.stack([_np(a) for a in arrs], axis=0))


def from_hf_clip_state_dict(sd: Mapping[str, Any], config: CLIPConfig) -> Params:
    """Convert a HuggingFace ``transformers.CLIPModel`` state dict.

    HF stores separate q/k/v projections with torch (out, in) layout; this
    framework fuses them into a (in, 3*width) matrix with [Q|K|V] columns.
    """

    def tower(prefix: str, layers: int) -> Params:
        blocks = {
            "ln1": {"scale": [], "bias": []},
            "ln2": {"scale": [], "bias": []},
            "attn": {"wqkv": [], "bqkv": [], "wo": [], "bo": []},
            "mlp": {"w1": [], "b1": [], "w2": [], "b2": []},
        }
        for i in range(layers):
            p = f"{prefix}.encoder.layers.{i}"
            wq = _np(sd[f"{p}.self_attn.q_proj.weight"]).T
            wk = _np(sd[f"{p}.self_attn.k_proj.weight"]).T
            wv = _np(sd[f"{p}.self_attn.v_proj.weight"]).T
            bq = _np(sd[f"{p}.self_attn.q_proj.bias"])
            bk = _np(sd[f"{p}.self_attn.k_proj.bias"])
            bv = _np(sd[f"{p}.self_attn.v_proj.bias"])
            blocks["attn"]["wqkv"].append(np.concatenate([wq, wk, wv], axis=1))
            blocks["attn"]["bqkv"].append(np.concatenate([bq, bk, bv], axis=0))
            blocks["attn"]["wo"].append(_np(sd[f"{p}.self_attn.out_proj.weight"]).T)
            blocks["attn"]["bo"].append(_np(sd[f"{p}.self_attn.out_proj.bias"]))
            blocks["ln1"]["scale"].append(_np(sd[f"{p}.layer_norm1.weight"]))
            blocks["ln1"]["bias"].append(_np(sd[f"{p}.layer_norm1.bias"]))
            blocks["ln2"]["scale"].append(_np(sd[f"{p}.layer_norm2.weight"]))
            blocks["ln2"]["bias"].append(_np(sd[f"{p}.layer_norm2.bias"]))
            blocks["mlp"]["w1"].append(_np(sd[f"{p}.mlp.fc1.weight"]).T)
            blocks["mlp"]["b1"].append(_np(sd[f"{p}.mlp.fc1.bias"]))
            blocks["mlp"]["w2"].append(_np(sd[f"{p}.mlp.fc2.weight"]).T)
            blocks["mlp"]["b2"].append(_np(sd[f"{p}.mlp.fc2.bias"]))
        return jax.tree.map(_stack, blocks, is_leaf=lambda x: isinstance(x, list))

    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])  # (W, 3, p, p)
    patch_embed = conv.reshape(conv.shape[0], -1).T  # (3*p*p, W) channel-major

    params = {
        "visual": {
            "patch_embed": jnp.asarray(patch_embed),
            "cls": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"])),
            "pos": jnp.asarray(_np(sd["vision_model.embeddings.position_embedding.weight"])),
            "ln_pre": {
                "scale": jnp.asarray(_np(sd["vision_model.pre_layrnorm.weight"])),
                "bias": jnp.asarray(_np(sd["vision_model.pre_layrnorm.bias"])),
            },
            "blocks": tower("vision_model", config.vision.layers),
            "ln_post": {
                "scale": jnp.asarray(_np(sd["vision_model.post_layernorm.weight"])),
                "bias": jnp.asarray(_np(sd["vision_model.post_layernorm.bias"])),
            },
            "proj": jnp.asarray(_np(sd["visual_projection.weight"]).T),
        },
        "text": {
            "tok_embed": jnp.asarray(_np(sd["text_model.embeddings.token_embedding.weight"])),
            "pos": jnp.asarray(_np(sd["text_model.embeddings.position_embedding.weight"])),
            "blocks": tower("text_model", config.text.layers),
            "ln_final": {
                "scale": jnp.asarray(_np(sd["text_model.final_layer_norm.weight"])),
                "bias": jnp.asarray(_np(sd["text_model.final_layer_norm.bias"])),
            },
            "proj": jnp.asarray(_np(sd["text_projection.weight"]).T),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params


def from_openai_clip_state_dict(sd: Mapping[str, Any], config: CLIPConfig) -> Params:
    """Convert an OpenAI ``clip`` package state dict (the layout the reference
    loads at main.py:152 via ``clip.load``).

    OpenAI fuses qkv as ``in_proj_weight`` (3W, W) already in [Q;K;V] row
    order; transpose gives our (W, 3W) column layout directly.
    """

    def tower(prefix: str, layers: int) -> Params:
        blocks = {
            "ln1": {"scale": [], "bias": []},
            "ln2": {"scale": [], "bias": []},
            "attn": {"wqkv": [], "bqkv": [], "wo": [], "bo": []},
            "mlp": {"w1": [], "b1": [], "w2": [], "b2": []},
        }
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            blocks["attn"]["wqkv"].append(_np(sd[f"{p}.attn.in_proj_weight"]).T)
            blocks["attn"]["bqkv"].append(_np(sd[f"{p}.attn.in_proj_bias"]))
            blocks["attn"]["wo"].append(_np(sd[f"{p}.attn.out_proj.weight"]).T)
            blocks["attn"]["bo"].append(_np(sd[f"{p}.attn.out_proj.bias"]))
            blocks["ln1"]["scale"].append(_np(sd[f"{p}.ln_1.weight"]))
            blocks["ln1"]["bias"].append(_np(sd[f"{p}.ln_1.bias"]))
            blocks["ln2"]["scale"].append(_np(sd[f"{p}.ln_2.weight"]))
            blocks["ln2"]["bias"].append(_np(sd[f"{p}.ln_2.bias"]))
            blocks["mlp"]["w1"].append(_np(sd[f"{p}.mlp.c_fc.weight"]).T)
            blocks["mlp"]["b1"].append(_np(sd[f"{p}.mlp.c_fc.bias"]))
            blocks["mlp"]["w2"].append(_np(sd[f"{p}.mlp.c_proj.weight"]).T)
            blocks["mlp"]["b2"].append(_np(sd[f"{p}.mlp.c_proj.bias"]))
        return jax.tree.map(_stack, blocks, is_leaf=lambda x: isinstance(x, list))

    conv = _np(sd["visual.conv1.weight"])  # (W, 3, p, p)
    params = {
        "visual": {
            "patch_embed": jnp.asarray(conv.reshape(conv.shape[0], -1).T),
            "cls": jnp.asarray(_np(sd["visual.class_embedding"])),
            "pos": jnp.asarray(_np(sd["visual.positional_embedding"])),
            "ln_pre": {
                "scale": jnp.asarray(_np(sd["visual.ln_pre.weight"])),
                "bias": jnp.asarray(_np(sd["visual.ln_pre.bias"])),
            },
            "blocks": tower("visual.transformer", config.vision.layers),
            "ln_post": {
                "scale": jnp.asarray(_np(sd["visual.ln_post.weight"])),
                "bias": jnp.asarray(_np(sd["visual.ln_post.bias"])),
            },
            "proj": jnp.asarray(_np(sd["visual.proj"])),  # already (W, embed)
        },
        "text": {
            "tok_embed": jnp.asarray(_np(sd["token_embedding.weight"])),
            "pos": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": tower("transformer", config.text.layers),
            "ln_final": {
                "scale": jnp.asarray(_np(sd["ln_final.weight"])),
                "bias": jnp.asarray(_np(sd["ln_final.bias"])),
            },
            "proj": jnp.asarray(_np(sd["text_projection"])),  # already (W, embed)
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params


def load_clip_weights(path: str, config: CLIPConfig) -> Params:
    """Load CLIP weights from a ``.npz`` (this framework's native dump), a
    torch ``.pt``/``.pth`` state dict (OpenAI ``clip.load`` layout or HF
    CLIPModel layout — autodetected), or a HF checkpoint directory
    (safetensors or pytorch_model.bin).
    """
    import os

    if path.endswith(".npz"):
        flat = dict(np.load(path))
        return unflatten_params(flat)

    if os.path.isdir(path):
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            from safetensors import safe_open  # ships with transformers

            obj = {}
            with safe_open(st, framework="np") as f:
                for k in f.keys():
                    obj[k] = f.get_tensor(k)
        else:
            import torch

            obj = torch.load(
                os.path.join(path, "pytorch_model.bin"),
                map_location="cpu", weights_only=True,
            )
        return from_hf_clip_state_dict(obj, config)

    import torch  # local import: torch is host-side tooling only

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    keys = set(obj.keys())
    if "visual.conv1.weight" in keys:
        return from_openai_clip_state_dict(obj, config)
    return from_hf_clip_state_dict(obj, config)


# ---------------------------------------------------------------------------
# Native flat (de)serialization — npz round trip
# ---------------------------------------------------------------------------


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, Mapping):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        flat[prefix.rstrip("/")] = np.asarray(params)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_clip_weights(params: Params, path: str) -> None:
    np.savez(path, **flatten_params(params))
