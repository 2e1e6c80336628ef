"""Module initialization that is fast on the tunneled TPU backend.

``nn.Module.init`` executes eagerly — one backend dispatch per primitive.
On a remote/tunneled device (the axon backend: one v5e chip behind a
network hop) every dispatch pays a round-trip, so initializing a large
module (the SD UNet traces to ~10^3 primitives) takes minutes before any
real work starts.  ``run_init`` wraps init into ONE jitted program on
non-CPU backends — a single (persistently cached) compile and a single
execution.  CPU stays eager: tests init tiny modules constantly and an
XLA compile per init would dominate there.
"""

from __future__ import annotations

import jax


def run_init(init_fn, rng, *args, **kwargs):
    """``init_fn(rng, *args, **kwargs)``, jitted on device backends."""
    if jax.default_backend() == "cpu":
        return init_fn(rng, *args, **kwargs)
    return jax.jit(lambda r: init_fn(r, *args, **kwargs))(rng)
