"""Device mesh + sharding helpers.

The reference has no distributed runtime at all (SURVEY.md §2.4: multi-GPU =
independent shell jobs with GPU_RANK env vars).  The TPU-native equivalent is
single-controller JAX over a 1-axis ``data`` mesh: the models (CLIP-L text
encoder ≈123M, SD UNet ≈860M) are replicated, and the scale axes — concepts
in Stage-1, captions in the covariance sweep, prompts/images in eval
generation — are batch-sharded over chips via ``jax.sharding``.  XLA inserts
the collectives (an all-reduce for the covariance accumulate, gathers for
eval metrics); nothing here issues communication explicitly.

Multi-slice / multi-process layouts add a ``dcn`` outer axis
(``multi_slice_mesh``): batch sharding rides ICI within a slice and DCN
across slices, which is the right hierarchy for embarrassingly-parallel
image generation.  ``default_mesh`` auto-detects a multi-process runtime
(``jax.distributed.initialize`` already called) and returns the
hierarchical mesh; ``shard_batch`` shards the leading axis over ALL mesh
axes, so every engine entry point works unchanged on either layout
(2-process CPU coverage: tests/test_multiprocess.py).
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


def multi_slice_mesh(num_slices: Optional[int] = None,
                     axis_names: Sequence[str] = ("dcn", "data")) -> Mesh:
    """2-axis hierarchical mesh: outer axis across slices (DCN — one slice
    per process by default), inner across the chips of a slice (ICI).
    Devices are grouped by owning process so the outer axis never cuts
    through a slice."""
    num_slices = num_slices or max(jax.process_count(), 1)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if len(devs) % num_slices:
        raise ValueError(
            f"{len(devs)} devices do not divide into {num_slices} slices")
    return Mesh(np.array(devs).reshape(num_slices, -1), tuple(axis_names))


def default_mesh(disable: bool = False) -> Optional[Mesh]:
    """The PRODUCT default: a data mesh over all visible devices when more
    than one is attached, else None (single-chip shapes stay mesh-free).

    Every CLI and eval harness calls this so that on a v5e-8 the shipped
    commands shard generation/Stage-1/stats over all chips out of the box
    (round-2 gap: the mesh was plumbed through every engine API but never
    constructed outside tests).  ``--no-mesh`` flags map to ``disable``.
    Under a multi-process runtime (multi-slice TPU or multi-host CPU after
    ``jax.distributed.initialize``) the mesh gains the ``dcn`` outer axis."""
    if disable or jax.device_count() < 2:
        return None
    if jax.process_count() > 1:
        return multi_slice_mesh()
    return get_mesh()


def shard_batch(x, mesh: Mesh, axis_name: Optional[str] = None):
    """Place an array batch-sharded along its leading axis.

    The leading axis is sharded over ALL mesh axes (for the 1-axis product
    mesh this is plain data parallelism; for a ("dcn", "data") multi-slice
    mesh the batch splits across slices first, then chips).  Pass
    ``axis_name`` to pin the shard to one named axis instead."""
    axes = (axis_name,) if axis_name else tuple(mesh.axis_names)
    spec = P(axes, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m ≥ n (batch padding so shards divide evenly)."""
    return ((n + m - 1) // m) * m
