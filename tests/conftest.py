"""Test configuration: force an 8-virtual-device CPU mesh.

The container's sitecustomize pins JAX_PLATFORMS=axon (one real TPU chip via a
tunnel). Tests must be hermetic and multi-device, so before any JAX backend
initialization we switch to CPU with 8 virtual devices — the standard JAX
substitute for a multi-chip backend (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def ref_root():
    path = "/root/reference"
    if not os.path.isdir(path):
        pytest.skip("reference repo not mounted")
    return path
