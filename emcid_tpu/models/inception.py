"""InceptionV3 pool3 feature extractor for FID — the rebuild of pytorch-fid's
``InceptionV3`` (reference: scripts/test_fid_score.py:4-43 uses pytorch-fid
with ``dims=2048``, i.e. the final-avgpool features of the FID InceptionV3).

Flax/NHWC port of the torchvision InceptionV3 trunk up to the 2048-d global
average pool, including pytorch-fid's three FID-specific patches (these match
the original TF-1 FID network and are what the canonical
``pt_inception-2015-12-05`` weights expect):

* InceptionA/C/E branch-pool uses ``avg_pool(count_include_pad=False)``;
* the second InceptionE (Mixed_7c) uses a **max** pool in its pool branch;
* inputs resize to 299x299 bilinear (half-pixel / align_corners=False) and
  normalize to [-1, 1].

``inception_from_torch`` converts a torch state_dict in torchvision /
pytorch-fid naming (Conv2d_1a_3x3.conv.weight, Mixed_5b.branch1x1.bn.*, ...)
so both torchvision's ImageNet weights and the FID weights load.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from emcid_tpu.runtime import precise_matmuls

FID_DIMS = 2048


class FrozenBatchNorm(nn.Module):
    """Inference-only BatchNorm with (scale, bias, mean, var) all as params
    — this net is never trained, so no batch_stats collection."""

    features: int
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        return x * inv + (bias - mean * inv)


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3, inference) + ReLU."""

    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.out_channels, name="bn")(x)
        return nn.relu(x)


def _basic(out, k, s=1, p=0):
    if isinstance(k, int):
        k = (k, k)
    if isinstance(p, int):
        p = ((p, p), (p, p))
    else:
        p = ((p[0], p[0]), (p[1], p[1]))
    return partial(BasicConv2d, out, k, (s, s), p)


def _avg_pool_3x3_s1(x, count_include_pad: bool):
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = True  # count_include_pad=False in the pool branch

    @nn.compact
    def __call__(self, x):
        b1 = _basic(64, 1)(name="branch1x1")(x)
        b5 = _basic(48, 1)(name="branch5x5_1")(x)
        b5 = _basic(64, 5, p=2)(name="branch5x5_2")(b5)
        b3 = _basic(64, 1)(name="branch3x3dbl_1")(x)
        b3 = _basic(96, 3, p=1)(name="branch3x3dbl_2")(b3)
        b3 = _basic(96, 3, p=1)(name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid)
        bp = _basic(self.pool_features, 1)(name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _basic(384, 3, s=2)(name="branch3x3")(x)
        bd = _basic(64, 1)(name="branch3x3dbl_1")(x)
        bd = _basic(96, 3, p=1)(name="branch3x3dbl_2")(bd)
        bd = _basic(96, 3, s=2)(name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _basic(192, 1)(name="branch1x1")(x)
        b7 = _basic(c7, 1)(name="branch7x7_1")(x)
        b7 = _basic(c7, (1, 7), p=(0, 3))(name="branch7x7_2")(b7)
        b7 = _basic(192, (7, 1), p=(3, 0))(name="branch7x7_3")(b7)
        bd = _basic(c7, 1)(name="branch7x7dbl_1")(x)
        bd = _basic(c7, (7, 1), p=(3, 0))(name="branch7x7dbl_2")(bd)
        bd = _basic(c7, (1, 7), p=(0, 3))(name="branch7x7dbl_3")(bd)
        bd = _basic(c7, (7, 1), p=(3, 0))(name="branch7x7dbl_4")(bd)
        bd = _basic(192, (1, 7), p=(0, 3))(name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid)
        bp = _basic(192, 1)(name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _basic(192, 1)(name="branch3x3_1")(x)
        b3 = _basic(320, 3, s=2)(name="branch3x3_2")(b3)
        b7 = _basic(192, 1)(name="branch7x7x3_1")(x)
        b7 = _basic(192, (1, 7), p=(0, 3))(name="branch7x7x3_2")(b7)
        b7 = _basic(192, (7, 1), p=(3, 0))(name="branch7x7x3_3")(b7)
        b7 = _basic(192, 3, s=2)(name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: FIDInceptionE_1 (Mixed_7b) -> avg pool w/o pad counting,
    # FIDInceptionE_2 (Mixed_7c) -> MAX pool (matches the TF FID network)
    pool_mode: str = "avg"  # "avg" | "max"
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = _basic(320, 1)(name="branch1x1")(x)
        b3 = _basic(384, 1)(name="branch3x3_1")(x)
        b3a = _basic(384, (1, 3), p=(0, 1))(name="branch3x3_2a")(b3)
        b3b = _basic(384, (3, 1), p=(1, 0))(name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _basic(448, 1)(name="branch3x3dbl_1")(x)
        bd = _basic(384, 3, p=1)(name="branch3x3dbl_2")(bd)
        bda = _basic(384, (1, 3), p=(0, 1))(name="branch3x3dbl_3a")(bd)
        bdb = _basic(384, (3, 1), p=(1, 0))(name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_s1(x, count_include_pad=not self.fid)
        bp = _basic(192, 1)(name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Trunk to the 2048-d pool3 features (pytorch-fid ``dims=2048``).

    Input: NHWC float in [0, 1] at any resolution; resized + renormalized
    internally when ``resize_input`` / ``normalize_input`` (pytorch-fid
    defaults).
    """

    fid: bool = True  # FID-patched pool branches (pt_inception weights)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = _basic(32, 3, s=2)(name="Conv2d_1a_3x3")(x)
        x = _basic(32, 3)(name="Conv2d_2a_3x3")(x)
        x = _basic(64, 3, p=1)(name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _basic(80, 1)(name="Conv2d_3b_1x1")(x)
        x = _basic(192, 3)(name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid=self.fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid=self.fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid=self.fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid=self.fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid=self.fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid=self.fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid=self.fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", fid=self.fid, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid else "avg", fid=self.fid,
                       name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)

    def init_params(self, rng):
        x = jnp.zeros((1, 299, 299, 3), jnp.float32)
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, x)["params"]


# ---------------------------------------------------------------------------
# torch state_dict conversion
# ---------------------------------------------------------------------------

_BN_MAP = {
    "weight": ("scale", lambda w: w),
    "bias": ("bias", lambda w: w),
    "running_mean": ("mean", lambda w: w),
    "running_var": ("var", lambda w: w),
}


def inception_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision / pytorch-fid InceptionV3 state_dict → Flax params.

    Accepts both plain torchvision naming (``Mixed_5b.branch1x1.conv.weight``)
    and pytorch-fid checkpoints (same names; fc/AuxLogits entries ignored).
    """
    params: Dict[str, Any] = {}

    def put(path: Sequence[str], value):
        d = params
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(value)

    for key, w in state_dict.items():
        w = np.asarray(w)
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue  # classifier head — not part of the feature trunk
        *mods, leaf = parts
        if mods[-1] == "conv" and leaf == "weight":
            put(mods + ["kernel"], w.transpose(2, 3, 1, 0))
        elif mods[-1] == "bn":
            if leaf == "num_batches_tracked":
                continue
            name, f = _BN_MAP[leaf]
            put(mods + [name], f(w))
        else:  # pragma: no cover — unknown key is a layout error
            raise ValueError(f"unexpected inception key {key!r}")
    return params


def load_inception(weights_path=None, fid: bool = True):
    """(model, params) ready for ``fid_features``.

    ``weights_path``: a torch ``.pth``/``.pt`` state_dict (torchvision
    inception_v3 or pytorch-fid's pt_inception file) or an ``.npz`` of
    already-converted Flax leaves; ``None`` → random init (smoke runs only).
    """
    import jax

    model = InceptionV3Features(fid=fid)
    if weights_path is None:
        return model, model.init_params(jax.random.PRNGKey(0))
    p = str(weights_path)
    if p.endswith(".npz"):
        from flax.traverse_util import unflatten_dict

        flat = {tuple(k.split("/")): jnp.asarray(v)
                for k, v in np.load(p).items()}
        return model, unflatten_dict(flat)
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    return model, inception_from_torch(sd)


def make_fid_extractor(weights_path=None, fid: bool = True,
                       batch_size: int = 64):
    """Callable(images)->(N,2048) for evals.scorers.fid_between_folders."""
    model, params = load_inception(weights_path, fid=fid)
    return lambda images: fid_features(model, params, images,
                                       batch_size=batch_size)


def fid_features(model: InceptionV3Features, params, images,
                 batch_size: int = 64) -> np.ndarray:
    """uint8/float NHWC images → (N, 2048) float32 activations, batched with
    a fixed program shape (pytorch-fid's get_activations,
    reference test_fid_score.py usage)."""

    # precise_matmuls: reference FID features are exact-f32 torch
    # (test_fid_score.py); TPU default bf16-rounded f32 convs would shift
    # pool3 activations ~0.4% (PERF.md round 4, precision pins)
    @jax.jit
    @precise_matmuls
    def run(p, x):
        return model.apply({"params": p}, x)

    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    out = []
    n = len(images)
    for i in range(0, n, batch_size):
        chunk = images[i:i + batch_size]
        keep = len(chunk)
        if keep < batch_size:
            chunk = np.pad(chunk,
                           ((0, batch_size - keep),) + ((0, 0),) * 3)
        out.append(np.asarray(run(params, jnp.asarray(chunk)))[:keep])
    return np.concatenate(out, axis=0)
