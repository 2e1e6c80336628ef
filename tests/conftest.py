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

# Session-wide tiny-pipeline memo: ~30 test modules each build a tiny
# pipeline fixture; construction is deterministic in (seed, words), and
# components are treated as immutable everywhere (params flow as call
# args; edits go through replace_*), so identical requests can share one
# instance.  Saves ~1-2 min of init per full run on this 1-core host.
import emcid_tpu.models.loader as _loader
import emcid_tpu.models.sdxl as _sdxl

_BTP_CACHE = {}
_BTP_SUMS = {}


def _param_checksum(comps):
    # cheap order-stable digest over every param leaf (float sums are
    # deterministic here: same arrays, same reduction order)
    import jax

    total = 0.0
    for field in ("text_params", "text_params_2", "unet_params",
                  "vae_params"):
        tree = getattr(comps, field, None)
        if tree is not None:
            for leaf in jax.tree.leaves(tree):
                total += float(np.sum(np.asarray(leaf, np.float64)))
    return total


for _mod, _name in ((_loader, "build_tiny_pipeline"),
                    (_sdxl, "build_tiny_sdxl_pipeline")):
    _orig = getattr(_mod, _name)

    def _cached(seed=0, words=None, __orig=_orig, __name=_name):
        key = (__name, seed, tuple(words or ()))
        if key not in _BTP_CACHE:
            _BTP_CACHE[key] = __orig(seed=seed, words=words)
            _BTP_SUMS[key] = _param_checksum(_BTP_CACHE[key])
        return _BTP_CACHE[key]

    setattr(_mod, _name, _cached)


def pytest_sessionfinish(session, exitstatus):
    # the memo is only sound while the shared components stay immutable
    # (edits must go through replace_*); an in-place param mutation
    # anywhere would silently couple ~30 test modules — fail loudly here
    for key, expect in _BTP_SUMS.items():
        got = _param_checksum(_BTP_CACHE[key])
        if got != expect:
            raise RuntimeError(
                f"shared tiny pipeline {key} was mutated in place "
                f"(param checksum {expect!r} -> {got!r}); some test "
                "bypassed the functional replace_* path")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
