"""Runtime setup: persistent XLA compilation cache.

TPU compiles for the SD UNet sampler are expensive (minutes); the persistent
cache makes every program a one-time cost per machine.  Enabled on package
import (opt out with ``EMCID_TPU_NO_CACHE=1``; dir via ``EMCID_TPU_CACHE``).
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Short hash of the host CPU's identity (ISA + model).

    The flags line alone is not discriminating enough: two VM hosts can
    print identical cpuinfo flags while LLVM's cpuid-based feature
    detection (what XLA:CPU AOT actually targets — e.g. the amx-*/
    prefer-no-scatter pseudo-features in the loader's mismatch warnings)
    differs, and a stale same-hash cache entry can SIGILL/segfault on
    load (observed round 5).  Fold in the model/family/stepping lines."""
    import hashlib

    try:
        keep = ("flags", "Features", "model name", "cpu family", "model",
                "stepping", "vendor_id")
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only
                if line.split(":")[0].strip() in keep or line.startswith(
                        ("flags", "Features")):
                    lines.append(line.strip())
        if lines:
            return hashlib.md5("\n".join(lines).encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform as _platform

    return hashlib.md5(
        f"{_platform.machine()}-{_platform.processor()}".encode()
    ).hexdigest()[:10]


def setup_compilation_cache(platform: str = None) -> None:
    if os.environ.get("EMCID_TPU_NO_CACHE") == "1":
        return
    try:
        import jax

        # per-platform subdir: CPU and TPU executables must not share a
        # cache (cross-machine CPU AOT entries trip feature-mismatch loads)
        if platform is None:
            platform = os.environ.get("JAX_PLATFORMS",
                                      "default").split(",")[0]
        subdir = platform or "default"
        if subdir == "cpu":
            # CPU AOT code is host-ISA-specific: a cache dir carried to a
            # machine with different CPU features loads with "could lead to
            # SIGILL" warnings and subtly different codegen — key the dir on
            # the host's identity.  "default" (usually the TPU backend)
            # stays un-fingerprinted: device executables are not
            # host-ISA-specific, and fingerprinting there would orphan the
            # cache whenever the *client* host changes.
            subdir = f"{subdir}-{_host_fingerprint()}"
        cache_dir = os.path.join(
            os.environ.get("EMCID_TPU_CACHE",
                           os.path.expanduser("~/.cache/emcid_tpu_xla")),
            subdir,
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # CPU (tests) caches aggressively — dirs are per-platform so feature
        # mismatch across backends can't occur; TPU keeps a higher floor
        min_secs = 1.0 if platform == "cpu" else 5.0
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


def force_cpu_platform() -> None:
    """Switch THIS process to the CPU backend and rekey the persistent
    cache dir to the host-fingerprinted CPU subdir.

    The env var ``JAX_PLATFORMS`` is read too early on hosts whose
    sitecustomize pre-imports jax, so CLIs switch in-process via
    ``jax.config.update("jax_platforms", "cpu")`` — but the cache subdir
    was keyed off the env var at import, which silently dropped
    host-ISA-specific CPU executables into the shared backend dir
    (loadable by a DIFFERENT host's session → SIGILL/segfault class,
    observed round 5).  Every in-process CPU switch must go through
    here."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"  # for child processes / re-setup
    setup_compilation_cache("cpu")


def precise_matmuls(fn):
    """Run ``fn`` under ``jax.default_matmul_precision("highest")``.

    TPU's DEFAULT handling of an f32 matmul is a single bf16-rounded MXU
    pass (~0.4% relative error on the inputs).  For the bf16 model
    forwards that is the intended arithmetic, but the framework's
    closed-form math (covariance statistics, UCE factorizations, the
    Stage-2 solve and inserts, region-edit pre-folds) is f32 linear
    algebra whose reference counterpart runs at full f32/f64 on GPU —
    measured on-chip, the default precision put a systematic O(0.4%)
    bias on exactly these sum-of-products shapes while every CPU test
    (exact f32 on CPU regardless of the setting) stayed green (PERF.md
    round 4, prof_gn2).  bf16-input matmuls are unaffected, and the cost
    is negligible at closed-form sizes.

    SCOPE RULE (ADVICE r4): apply this only to the closed-form jitted
    programs themselves (``jax.jit(precise_matmuls(fn))`` so the context
    is entered during trace and the caller-side trace context stays
    default) or to pure-eager math.  Do NOT decorate high-level entry
    points that call cached jitted model programs (sampler, UNet/CLIP
    forwards): the context becomes part of those programs' jit cache key,
    so the same bf16 program compiles twice (pinned + unpinned callers).
    For individual dots inside mixed functions use :func:`pdot`.
    """
    import functools

    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def pdot(a, b):
    """f32-exact matmul for closed-form math: one dot pinned to
    ``Precision.HIGHEST`` (the 6-pass bf16x6 decomposition on TPU).

    Use this at individual dot sites inside high-level functions that ALSO
    call big bf16 model programs (sampler, UNet/text-encoder forwards).
    Wrapping such functions in :func:`precise_matmuls` would put every
    cached jitted program they reach under a second trace context — the
    same program compiles once per context (~2-5 min each on the tunneled
    TPU) and persists as duplicate compilation-cache entries (ADVICE r4).
    An explicit ``precision=`` on the dot carries no trace-context at all.
    """
    import jax
    import jax.numpy as jnp

    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def trace_env_knobs() -> tuple:
    """Values of every env knob that changes a *traced program* (kernel
    block sizes, fused-GN path, Stage-1 remat/chunking).  In-process
    program memos (_JIT_CACHE, _SAMPLER_CACHE, _OPTZ_CACHE, SDXL sampler)
    fold this into their keys so flipping a knob mid-process retraces
    instead of silently reusing a stale executable — the same hazard class
    as the round-3 _OPTZ_CACHE schedule-key finding (ADVICE.md)."""
    return tuple(
        os.environ.get(k)
        for k in (
            "EMCID_TPU_FUSED_GN", "EMCID_TPU_FUSED_LN",
            "EMCID_TPU_FLASH_BQ", "EMCID_TPU_FLASH_BK",
            "EMCID_TPU_FLASH_BQ_BWD", "EMCID_TPU_FLASH_BK_BWD",
            "EMCID_TPU_Z_REMAT", "EMCID_TPU_Z_CHUNK",
            "EMCID_TPU_NO_FLASH", "EMCID_TPU_ATTN",
            "EMCID_TPU_FLASH_MIN_SEQ",
            "EMCID_TPU_Z_FRAC", "EMCID_TPU_Z_PEAK",
        )
    )
