"""Runtime setup: persistent XLA compilation cache.

TPU compiles for the SD UNet sampler are expensive (minutes); the persistent
cache makes every program a one-time cost per machine.  Enabled on package
import (opt out with ``EMCID_TPU_NO_CACHE=1``; dir via ``EMCID_TPU_CACHE``).
"""

from __future__ import annotations

import os


def setup_compilation_cache() -> None:
    if os.environ.get("EMCID_TPU_NO_CACHE") == "1":
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "EMCID_TPU_CACHE", os.path.expanduser("~/.cache/emcid_tpu_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass
