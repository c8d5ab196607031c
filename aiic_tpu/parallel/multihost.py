"""Multi-host (multi-process) data-parallel input placement.

SURVEY.md §2d names ``jax.make_array_from_process_local_data`` as the DP
input path for pod slices: each host loads only its shard of the global
batch, and the resulting global ``jax.Array`` is sharded over the mesh's
('data',) axis without any host ever materializing the full batch.

Single-process runs (one chip, or the 8-virtual-CPU test mesh) flow through
the exact same call — ``process_count == 1`` simply means the local data IS
the global batch — so there is one input-placement seam for both regimes:

    mesh = create_mesh(...)
    batch = host_local_batch(mesh, local_pixels)   # this host's rows only
    loss, ... = train_step(params, lora, opt, batch, tokens_batch, rng)

Multi-process initialization itself is standard JAX:
``jax.distributed.initialize(coordinator, num_processes, process_id)`` before
first device use; see tests/test_multihost.py which runs a real 2-process
CPU cluster through this module.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_size(mesh: Mesh, local_batch: int) -> int:
    """Global batch implied by a per-host batch under ('data',) sharding."""
    return local_batch * jax.process_count()


def host_local_batch(
    mesh: Mesh,
    local_data: np.ndarray,
    spec: Optional[P] = None,
) -> jax.Array:
    """Assemble a global, ('data',)-sharded array from this process's rows.

    ``local_data`` is the slice of the global batch this host loaded
    (shape ``(global_batch / process_count, ...)``). Every participating
    process must call this with its own slice; the returned global array has
    leading dim ``global_batch`` and never exists fully on any single host.
    """
    spec = P("data") if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_data))


def process_local_rows(global_rows: np.ndarray) -> np.ndarray:
    """Slice THIS process's shard of a global batch's rows (or indices).

    The multi-host DP contract is two-sided: every process passes its own
    disjoint ``global_batch / process_count`` rows to
    :func:`host_local_batch`, which assembles the global array. Feeding the
    full global batch from every process would duplicate each row
    ``process_count`` times — and under a contrastive loss each duplicate
    on another host is a labeled NEGATIVE with cosine 1.0, silently
    degenerating training. Single-process: identity."""
    n = jax.process_count()
    if n == 1:
        return global_rows
    b = len(global_rows)
    if b % n:
        raise ValueError(
            f"global batch {b} not divisible by process_count {n}")
    shard = b // n
    i = jax.process_index()
    return global_rows[i * shard:(i + 1) * shard]


def replicated(mesh: Mesh, data: np.ndarray) -> jax.Array:
    """Place small host data (token tables, text caches) replicated on the
    mesh. All processes must pass identical values."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, np.asarray(data))
