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


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 2**30
    except OSError:  # non-Linux fallback: never triggers the clear
        return 0.0


# jax holds every compiled executable in-process for the session; the
# full slow tier (~260 compile-heavy tests) accretes tens of GB and the
# XLA:CPU compiler/cache then SEGFAULTS under allocation pressure at a
# reproducible suite position (round-5 incident: three crashes at the
# same test, passes standalone).  Shed the executable caches between
# modules once RSS crosses a threshold — the persistent disk cache makes
# re-compiles cheap, and correctness is unaffected.
_RSS_CLEAR_GB = float(os.environ.get("EMCID_TPU_TEST_RSS_CLEAR_GB", 24))


@pytest.fixture(autouse=True, scope="module")
def _shed_jax_caches_under_memory_pressure():
    yield
    if _rss_gb() >= _RSS_CLEAR_GB:
        import jax

        jax.clear_caches()
