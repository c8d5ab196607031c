"""Bit-faithful converter between reference ``.pth`` LoRA checkpoints and the
stacked JAX adapter tree.

Checkpoint ground truth (verified on both shipped files, SURVEY.md §2c):
48 float32 tensors named
``clip_model.transformer.resblocks.{i}.mlp.{c_fc|c_proj}.lora.{lora_A|lora_B}``
with A=(in, 4), B=(4, out). The trainer variant may additionally emit
``...attn.out_proj.lora.*`` keys (reference train_lora.py:81-84), and
``main.py``'s whole-model injection produces un-prefixed and ``visual.``-
prefixed names (reference main.py:62-74). The reference loads with a fuzzy
``endswith`` match (main.py:100-107); we implement the same resolution
explicitly: strip any wrapper prefix, route on tower, index on layer.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.adapters.lora import LoRAConfig, init_text_lora
from aiic_tpu.models.config import CLIPConfig

Params = Dict[str, Any]

_KEY_RE = re.compile(
    r"^(?P<prefix>.*?)(?P<tower>visual\.)?transformer\.resblocks\."
    r"(?P<layer>\d+)\.(?P<site>attn\.out_proj|mlp\.c_fc|mlp\.c_proj)"
    r"\.lora\.(?P<ab>lora_A|lora_B)$"
)

_SITE_TO_POINT = {"attn.out_proj": "out_proj", "mlp.c_fc": "c_fc", "mlp.c_proj": "c_proj"}
_POINT_TO_SITE = {v: k for k, v in _SITE_TO_POINT.items()}


def parse_lora_key(key: str) -> Optional[Tuple[str, int, str, str]]:
    """-> (tower, layer, attach_point, 'A'|'B') or None if not a LoRA key."""
    m = _KEY_RE.match(key)
    if not m:
        return None
    tower = "visual" if m.group("tower") else "text"
    return tower, int(m.group("layer")), _SITE_TO_POINT[m.group("site")], m.group("ab")[-1]


def load_pth_dict(path_or_dict) -> Mapping[str, Any]:
    """Load a ``.pth`` state dict (pass-through for already-loaded dicts)."""
    if isinstance(path_or_dict, str):
        import torch

        return torch.load(path_or_dict, map_location="cpu", weights_only=True)
    return path_or_dict


def infer_lora_rank(path_or_dict) -> Optional[int]:
    """Rank from the first text-tower ``lora_A`` key's trailing dim (in, r).

    Returns None if the checkpoint has no parsable text LoRA keys. Lets CLIs
    load rank-4 reference checkpoints and this repo's rank-16 trainer output
    with the same flags (alpha is not stored in ``.pth`` and must come from
    config; the reference keeps alpha/rank = 2.0 in both variants).
    """
    for key, value in load_pth_dict(path_or_dict).items():
        parsed = parse_lora_key(key)
        if parsed is None or parsed[0] != "text" or parsed[3] != "A":
            continue
        shape = tuple(value.shape)
        if len(shape) == 2:
            return int(shape[1])
    return None


def lora_tree_from_pth(
    path_or_dict,
    config: CLIPConfig,
    lora: LoRAConfig,
    seed: int = 0,
) -> Params:
    """Load a reference ``.pth`` LoRA checkpoint into a stacked text-tower tree.

    Attach points present in ``lora.attach`` but absent from the checkpoint
    keep the fresh init (random A, zero B) — mathematically a no-op, matching
    the reference's non-strict load (main.py:86-113). ``visual.*`` keys are
    ignored: per SURVEY.md §2c they are no-ops in the effective model.
    """
    ckpt = load_pth_dict(path_or_dict)

    tree = init_text_lora(jax.random.PRNGKey(seed), config, lora)
    # Mutable numpy staging buffers.
    staged = {
        point: {ab: np.asarray(tree[point][ab]).copy() for ab in ("A", "B")}
        for point in tree
    }
    loaded, skipped = 0, []
    for key, value in ckpt.items():
        parsed = parse_lora_key(key)
        if parsed is None:
            skipped.append(key)
            continue
        tower, layer, point, ab = parsed
        if tower != "text" or point not in staged:
            skipped.append(key)
            continue
        arr = np.asarray(value.detach().cpu().float().numpy() if hasattr(value, "detach") else value,
                         dtype=np.float32)
        expect = staged[point][ab][layer].shape
        if arr.shape != expect:
            raise ValueError(f"{key}: shape {arr.shape} != expected {expect} "
                             f"(checkpoint rank vs LoRAConfig.rank mismatch?)")
        staged[point][ab][layer] = arr
        loaded += 1
    out = {p: {ab: jnp.asarray(staged[p][ab]) for ab in ("A", "B")} for p in staged}
    out_meta = {"loaded": loaded, "skipped": skipped}
    return out, out_meta


def lora_tree_to_pth_dict(tree: Params, prefix: str = "clip_model.") -> Dict[str, np.ndarray]:
    """Serialize a stacked text-LoRA tree back to reference key layout.

    With the default prefix this reproduces the trainer's save format
    (reference train_lora.py:293-299) exactly; converting a loaded shipped
    checkpoint back must round-trip bit-identically (tested).
    """
    out: Dict[str, np.ndarray] = {}
    for point, ab_tree in tree.items():
        site = _POINT_TO_SITE[point]
        layers = ab_tree["A"].shape[0]
        for i in range(layers):
            base = f"{prefix}transformer.resblocks.{i}.{site}.lora"
            out[f"{base}.lora_A"] = np.asarray(ab_tree["A"][i], dtype=np.float32)
            out[f"{base}.lora_B"] = np.asarray(ab_tree["B"][i], dtype=np.float32)
    return out


def save_lora_pth(tree: Params, path: str, prefix: str = "clip_model.") -> None:
    """Write a torch-loadable ``.pth`` of the adapter (reference-compatible)."""
    import torch

    sd = {k: torch.from_numpy(v.copy()) for k, v in lora_tree_to_pth_dict(tree, prefix).items()}
    torch.save(sd, path)
