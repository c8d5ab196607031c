"""Platform selection helper.

This container's sitecustomize pins ``JAX_PLATFORMS=axon`` (the TPU tunnel)
and the env var cannot be overridden from the shell. ``AIIC_PLATFORM`` gives
CLIs an escape hatch (e.g. ``AIIC_PLATFORM=cpu`` for smoke runs); it must be
applied before the first JAX backend use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("AIIC_PLATFORM")
    if not plat:
        return
    if plat == "cpu" and "AIIC_CPU_DEVICES" in os.environ:
        n = os.environ["AIIC_CPU_DEVICES"]
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n} " + os.environ.get("XLA_FLAGS", "")
        )
    import jax

    jax.config.update("jax_platforms", plat)
