"""Device mesh + sharding helpers.

The reference has no distributed runtime at all (SURVEY.md §2.4: multi-GPU =
independent shell jobs with GPU_RANK env vars).  The TPU-native equivalent is
single-controller JAX over a 1-axis ``data`` mesh: the models (CLIP-L text
encoder ≈123M, SD UNet ≈860M) are replicated, and the scale axes — concepts
in Stage-1, captions in the covariance sweep, prompts/images in eval
generation — are batch-sharded over chips via ``jax.sharding``.  XLA inserts
the collectives (an all-reduce for the covariance accumulate, gathers for
eval metrics); nothing here issues communication explicitly.

Multi-slice layouts add a ``dcn`` outer axis; batch sharding rides ICI
within a slice and DCN across slices, which is the right hierarchy for
embarrassingly-parallel image generation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def default_mesh(disable: bool = False) -> Optional[Mesh]:
    """The PRODUCT default: a data mesh over all visible devices when more
    than one is attached, else None (single-chip shapes stay mesh-free).

    Every CLI and eval harness calls this so that on a v5e-8 the shipped
    commands shard generation/Stage-1/stats over all chips out of the box
    (round-2 gap: the mesh was plumbed through every engine API but never
    constructed outside tests).  ``--no-mesh`` flags map to ``disable``."""
    if disable or jax.device_count() < 2:
        return None
    return get_mesh()


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Place an array batch-sharded along its leading axis."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m ≥ n (batch padding so shards divide evenly)."""
    return ((n + m - 1) // m) * m
