"""Test configuration: force an 8-virtual-device CPU mesh BEFORE jax import.

Multi-chip sharding logic is validated on a host-platform device mesh
(``xla_force_host_platform_device_count``), per SURVEY.md §4: real TPU
hardware is single-chip in CI, so every pjit/shard_map path must compile and
run on virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
# remote TPU tunnel), so the env var alone is read too early — override the
# live config before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
