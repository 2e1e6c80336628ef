"""AutoencoderKL (SD VAE) in Flax, NHWC.

Encoder → (mean, logvar) diagonal Gaussian over 4-channel latents at 1/8
resolution; decoder back to RGB.  Used by Stage-1 (vae.encode of training
images, reference compute_z.py:498) and by the sampling pipeline (decode).
Module naming mirrors HF AutoencoderKL for mechanical weight conversion.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emcid_tpu.models.configs import VAEConfig


class VaeResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    """Single-head spatial self-attention over H·W tokens."""

    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        from emcid_tpu.ops.attention import attention as _attention

        out = _attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            scale=C**-0.5,
        )[:, :, 0, :]
        out = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for lvl, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VaeResnetBlock(out_ch, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{lvl}_resnets_{j}")(h)
            if lvl < n - 1:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype,
                            name=f"down_blocks_{lvl}_downsamplers_0_conv")(h)
        mid = cfg.block_out_channels[-1]
        h = VaeResnetBlock(mid, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_resnets_0")(h)
        h = VaeAttention(cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = VaeResnetBlock(mid, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        mid = cfg.block_out_channels[-1]
        h = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        h = VaeResnetBlock(mid, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_resnets_0")(h)
        h = VaeAttention(cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = VaeResnetBlock(mid, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_resnets_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        n = len(rev)
        for lvl, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VaeResnetBlock(out_ch, cfg.norm_num_groups,
                                   dtype=self.dtype,
                                   name=f"up_blocks_{lvl}_resnets_{j}")(h)
            if lvl < n - 1:
                B, H, W, C = h.shape
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
                h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"up_blocks_{lvl}_upsamplers_0_conv")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class LatentDist(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng) -> jnp.ndarray:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(rng, self.mean.shape,
                                                   self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x) -> LatentDist:
        """RGB NHWC in [-1, 1] → latent distribution (pre-scaling-factor)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return LatentDist(mean, logvar)

    def decode(self, z) -> jnp.ndarray:
        """Latents (pre-scaling-factor) → RGB NHWC."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        dist = self.encode(x)
        z = dist.sample(rng) if rng is not None else dist.mode()
        return self.decode(z), dist

    def init_params(self, rng, image_size: int = 32):
        dummy = jnp.zeros((1, image_size, image_size, self.config.in_channels),
                          dtype=jnp.float32)
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, dummy)["params"]
