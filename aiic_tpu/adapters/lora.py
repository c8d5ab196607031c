"""LoRA adapter parameter trees.

The adapter is a *stacked* pytree — one leading layer axis, matching the
scan-stacked backbone blocks — with attach points mirroring the reference
trainer's wrap set (reference train_lora.py:76-98): the text tower's
``attn.out_proj``, ``mlp.c_fc`` and ``mlp.c_proj``.

Math parity (reference main.py:19-31 / train_lora.py:15-29):
  delta(x) = (x @ A @ B) * (alpha / rank),  A ~ N(0, 0.02^2) of shape (in, r),
  B = zeros of shape (r, out)  — so a fresh adapter is a no-op.

Two deployment modes:
- **threaded** (training): the tree rides through the text-tower scan and only
  its leaves receive gradients.
- **folded** (inference): ``fold_text_lora`` bakes W' = W + scaling * (A @ B)
  into the backbone — zero inference overhead, mathematically identical
  because the adapters are frozen at inference time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from aiic_tpu.models.config import CLIPConfig

Params = Dict[str, Any]

# Attach-point name -> (weight path inside a text block, in/out dims fn)
ATTACH_POINTS = ("out_proj", "c_fc", "c_proj")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 4
    alpha: int = 8
    # Which of the text-block linears carry adapters. The shipped reference
    # checkpoints cover only the MLP pair (SURVEY.md §2c); the reference
    # trainer also wraps out_proj (train_lora.py:81-84).
    attach: Sequence[str] = ("c_fc", "c_proj")

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _dims(point: str, width: int, mlp_dim: int):
    if point == "out_proj":
        return width, width
    if point == "c_fc":
        return width, mlp_dim
    if point == "c_proj":
        return mlp_dim, width
    raise ValueError(f"unknown LoRA attach point: {point}")


def init_text_lora(key: jax.Array, config: CLIPConfig, lora: LoRAConfig) -> Params:
    """Stacked adapter tree over the text tower's layers.

    A ~ N(0, 0.02^2), B = 0 (reference main.py:26-27).
    """
    layers = config.text.layers
    width = config.text.width
    mlp_dim = config.text.mlp_dim
    tree: Params = {}
    keys = jax.random.split(key, len(lora.attach))
    for k, point in zip(keys, lora.attach):
        din, dout = _dims(point, width, mlp_dim)
        tree[point] = {
            "A": jax.random.normal(k, (layers, din, lora.rank), jnp.float32) * 0.02,
            "B": jnp.zeros((layers, lora.rank, dout), jnp.float32),
        }
    return tree


def init_tower_lora(
    key: jax.Array, layers: int, width: int, mlp_dim: int, lora: LoRAConfig
) -> Params:
    """Stacked adapter tree for an arbitrary tower (used for the visual tower
    when reproducing the reference's whole-model injection, main.py:62-74 —
    mathematically a no-op until trained, since B starts at zero)."""
    tree: Params = {}
    keys = jax.random.split(key, len(lora.attach))
    for k, point in zip(keys, lora.attach):
        din, dout = _dims(point, width, mlp_dim)
        tree[point] = {
            "A": jax.random.normal(k, (layers, din, lora.rank), jnp.float32) * 0.02,
            "B": jnp.zeros((layers, lora.rank, dout), jnp.float32),
        }
    return tree


def init_visual_lora(key: jax.Array, config: CLIPConfig, lora: LoRAConfig) -> Params:
    return init_tower_lora(
        key, config.vision.layers, config.vision.width, config.vision.mlp_dim, lora
    )


def fold_tower_lora(blocks: Params, lora_tree: Params, scaling: float) -> Params:
    """W' = W + scaling * A @ B for one tower's stacked blocks."""
    wmap = {"c_fc": ("mlp", "w1"), "c_proj": ("mlp", "w2"), "out_proj": ("attn", "wo")}
    new_blocks = jax.tree.map(lambda x: x, blocks)
    for point, ab in lora_tree.items():
        grp, name = wmap[point]
        delta = jnp.einsum("lir,lro->lio", ab["A"], ab["B"]) * scaling
        new_blocks[grp] = dict(new_blocks[grp])
        new_blocks[grp][name] = new_blocks[grp][name] + delta
    return new_blocks


def fold_text_lora(params: Params, lora_tree: Params, scaling: float) -> Params:
    """Return backbone params with W' = W + scaling * A @ B baked in.

    Folding is the inference-time equivalent of the reference's runtime
    ``LoRALinear`` wrappers (main.py:34-59): since B-zero adapters and
    missing attach points contribute exactly 0, folding the shipped
    checkpoints reproduces the reference's effective model.
    """
    new_text = dict(params["text"])
    new_text["blocks"] = fold_tower_lora(params["text"]["blocks"], lora_tree, scaling)
    out = dict(params)
    out["text"] = new_text
    return out


def fold_visual_lora(params: Params, lora_tree: Params, scaling: float) -> Params:
    new_vis = dict(params["visual"])
    new_vis["blocks"] = fold_tower_lora(params["visual"]["blocks"], lora_tree, scaling)
    out = dict(params)
    out["visual"] = new_vis
    return out


def lora_param_count(tree: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
