"""Device mesh construction.

The framework parallelizes with a 2-D ``('data', 'model')`` mesh:

- ``data``: batch sharding (pure data parallel) — the scaling axis that
  matters for this workload (SURVEY.md §2d: inference scale-out is pure DP).
- ``model``: Megatron-style tensor parallel over attention heads / MLP hidden
  dims — not needed at ViT-B scale on one chip, but wired end-to-end so the
  same program spans chips for larger towers (e.g. ViT-L/14).

Pipeline/expert/sequence parallelism are intentionally absent: the model has
12 blocks that fit one chip, no MoE, and fixed 197/77-token sequences
(SURVEY.md §2d) — sharding those axes would only add collective latency.

Collectives are never written by hand: shardings are declared with
``NamedSharding`` and XLA GSPMD inserts all-gathers/reduce-scatters that ride
ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, tp: Optional[int] = None) -> Tuple[int, int]:
    """Factor n into (data, model). Default: model axis 2 when even and >2
    devices (exercises TP collectives), else pure DP."""
    if tp is None:
        tp = 2 if (n_devices % 2 == 0 and n_devices > 2) else 1
    if n_devices % tp != 0:
        raise ValueError(f"{n_devices} devices not divisible by tp={tp}")
    return n_devices // tp, tp


def create_mesh(
    n_devices: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    dp, mp = mesh_shape_for(len(devices), tp)
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, ("data", "model"))
