"""LPIPS perceptual distance (AlexNet backbone) in Flax.

The reference uses the ``lpips`` pip package with the alex backbone at
64x64 (scripts/eval_coco.py:25-37, 73-193).  Implemented natively: AlexNet
conv features at the 5 standard taps, per-channel unit normalization,
learned 1x1 linear heads, spatial mean, layer sum.  ``lpips_from_torch``
converts the lpips-package checkpoint (net.slice* + lin*.model.1.weight);
random-init instances back the test suite.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from emcid_tpu.runtime import precise_matmuls

# ImageNet normalization the lpips package bakes in (shift/scale in [-1,1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet conv stack: (features, kernel, stride, padding)
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after conv1, conv2 (and before 3rd tap group)


class AlexNetFeatures(nn.Module):
    """AlexNet conv features; returns the 5 relu taps (NHWC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for i, (feat, k, s, p) in enumerate(_ALEX):
            x = nn.Conv(feat, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER or i == 4:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance; inputs RGB NHWC in [-1, 1]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1) -> jnp.ndarray:
        norm = lambda x: (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        net = AlexNetFeatures(dtype=self.dtype, name="net")
        f0, f1 = net(norm(x0)), net(norm(x1))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            unit = lambda t: t / jnp.sqrt(
                jnp.sum(t**2, axis=-1, keepdims=True) + 1e-10
            )
            d = (unit(a) - unit(b)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lin{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total

    def init_params(self, rng, size: int = 64):
        dummy = jnp.zeros((1, size, size, 3))
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, dummy, dummy)["params"]


def lpips_from_torch(state_dict) -> Dict[str, Any]:
    """lpips-package (alex) checkpoint → LPIPS params.  Torch layout:
    ``net.slice{1..5}.{idx}.weight`` convs and ``lin{0..4}.model.1.weight``."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    # conv indices inside torchvision alexnet.features
    conv_feature_idx = [0, 3, 6, 8, 10]
    p: Dict[str, Any] = {"net": {}}
    for i, idx in enumerate(conv_feature_idx):
        for key in (f"net.features.{idx}.weight", f"net.slice{i+1}.{idx}.weight"):
            if key in sd:
                w = sd[key]
                b = sd[key.replace("weight", "bias")]
                p["net"][f"conv{i}"] = {
                    "kernel": w.transpose(2, 3, 1, 0), "bias": b,
                }
                break
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                p[f"lin{i}"] = {"kernel": sd[key].transpose(2, 3, 1, 0)}
                break
    return p


class LPIPSScorer:
    """Convenience wrapper: uint8/float images → distances."""

    def __init__(self, params=None, seed: int = 0, size: int = 64):
        self.model = LPIPS()
        self.size = size
        self.params = params if params is not None else self.model.init_params(
            jax.random.PRNGKey(seed), size
        )

        @jax.jit
        @precise_matmuls  # exact-f32 parity with torch lpips (PERF.md r4)
        def run(params, a, b):
            return self.model.apply({"params": params}, a, b)

        self._run = run

    def _prep(self, imgs) -> jnp.ndarray:
        x = jnp.asarray(np.asarray(imgs))
        if x.ndim == 3:
            x = x[None]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        x = x * 2.0 - 1.0
        B, H, W, C = x.shape
        if (H, W) != (self.size, self.size):
            x = jax.image.resize(x, (B, self.size, self.size, C), "bilinear")
        return x

    def distance(self, imgs_a, imgs_b) -> np.ndarray:
        return np.asarray(self._run(self.params, self._prep(imgs_a),
                                    self._prep(imgs_b)))
