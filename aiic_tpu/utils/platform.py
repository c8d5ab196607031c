"""Platform selection helper.

This container's sitecustomize pins ``JAX_PLATFORMS=axon`` (the TPU tunnel)
and the env var cannot be overridden from the shell. ``AIIC_PLATFORM`` gives
CLIs an escape hatch (e.g. ``AIIC_PLATFORM=cpu`` for smoke runs); it must be
applied before the first JAX backend use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    enable_compilation_cache()
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


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent cross-process XLA compilation cache.

    Measured on this backend (v5e via the axon tunnel): a fresh process
    re-compiling an already-cached program deserializes the executable from
    disk instead of re-invoking the compiler — 2.0 s -> 0.3 s for a small
    jit, 1.8 s -> 0.2 s for a Pallas fused-attention program — and it covers
    Mosaic custom calls, so the multi-minute cold compile of the block_fused
    training kernels is paid once per MACHINE instead of once per process.
    Serving restarts also stop paying the per-bucket warmup compiles.

    Called from every CLI via ``apply_platform_env``. Opt-out with
    ``AIIC_COMPILE_CACHE=0``; directory override with
    ``AIIC_COMPILE_CACHE_DIR`` (default ``~/.cache/aiic_tpu/xla``). JAX's
    own min-compile-time threshold (1 s) keeps trivial programs out of the
    cache directory.
    """
    if os.environ.get("AIIC_COMPILE_CACHE", "1") == "0":
        return
    path = path or os.environ.get("AIIC_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "aiic_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable cache location: run uncached rather than fail
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
