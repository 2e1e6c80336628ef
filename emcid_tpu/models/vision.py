"""Vision towers for evaluation scoring: ViT classifier and CLIP vision.

The reference scores with hub-downloaded torch models
(ViT-base/large-patch16-224 classifier, emcid_test.py:123-125 and
util/evaluate.py:251-280; CLIP ViT-L/14, evaluate.py:66-96).  Both are
implemented natively (Flax, NHWC) with HF weight converters so local
checkpoints drop in; randomly-initialized instances back the test suite.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from emcid_tpu.models.clip_text import CLIPEncoderLayer, CLIPTextEncoder
from emcid_tpu.models.configs import CLIPTextConfig
from emcid_tpu.runtime import precise_matmuls

# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
VIT_IMAGE_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
VIT_IMAGE_STD = np.array([0.5, 0.5, 0.5], np.float32)


def preprocess_for_model(images, size: int, mean, std) -> jnp.ndarray:
    """uint8/float RGB (B,H,W,3) → resized+normalized (B,size,size,3)."""
    x = jnp.asarray(np.asarray(images))
    if x.ndim == 3:
        x = x[None]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    B, H, W, C = x.shape
    if (H, W) != (size, size):
        x = jax.image.resize(x, (B, size, size, C), method="bilinear")
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


# ---------------------------------------------------------------------------
# ViT classifier (HF ViTForImageClassification layout)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_labels: int = 1000
    layer_norm_eps: float = 1e-12


VIT_BASE_224 = ViTConfig()
VIT_LARGE_224 = ViTConfig(hidden_size=1024, num_hidden_layers=24,
                          num_attention_heads=16, intermediate_size=4096)
TINY_VIT = ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=64, num_labels=10)


class ViTSelfAttention(nn.Module):
    config: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        q = nn.Dense(h, dtype=self.dtype, name="query")(x)
        k = nn.Dense(h, dtype=self.dtype, name="key")(x)
        v = nn.Dense(h, dtype=self.dtype, name="value")(x)
        B, N, _ = x.shape
        split = lambda t: t.reshape(B, N, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) * (hd**-0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, N, h)
        return nn.Dense(h, dtype=self.dtype, name="output_dense")(out)


class ViTLayer(nn.Module):
    config: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = x + ViTSelfAttention(cfg, dtype=self.dtype, name="attention")(
            nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_before")(x)
        )
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm_after")(h)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(y)
        return h + y


class ViTClassifier(nn.Module):
    """ViT image classifier; input NHWC in model-normalized space."""

    config: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embeddings",
        )(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)),
                             patches], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, n_pos, cfg.hidden_size),
        ).astype(self.dtype)
        x = x + pos
        for i in range(cfg.num_hidden_layers):
            x = ViTLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype,
                          name="classifier")(x[:, 0])
        return logits

    def init_params(self, rng):
        dummy = jnp.zeros(
            (1, self.config.image_size, self.config.image_size, 3)
        )
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, dummy)["params"]


def vit_from_torch(state_dict, num_labels: int = 1000) -> Dict[str, Any]:
    """HF ViTForImageClassification state_dict → ViTClassifier params."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    p: Dict[str, Any] = {}
    pre = "vit."
    p["cls_token"] = sd[pre + "embeddings.cls_token"]
    p["position_embeddings"] = sd[pre + "embeddings.position_embeddings"]
    w = sd[pre + "embeddings.patch_embeddings.projection.weight"]
    p["patch_embeddings"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": sd[pre + "embeddings.patch_embeddings.projection.bias"],
    }
    i = 0
    while f"{pre}encoder.layer.{i}.attention.attention.query.weight" in sd:
        base = f"{pre}encoder.layer.{i}"
        lin = lambda n: {"kernel": sd[f"{n}.weight"].T, "bias": sd[f"{n}.bias"]}
        ln = lambda n: {"scale": sd[f"{n}.weight"], "bias": sd[f"{n}.bias"]}
        p[f"layer_{i}"] = {
            "attention": {
                "query": lin(f"{base}.attention.attention.query"),
                "key": lin(f"{base}.attention.attention.key"),
                "value": lin(f"{base}.attention.attention.value"),
                "output_dense": lin(f"{base}.attention.output.dense"),
            },
            "intermediate_dense": lin(f"{base}.intermediate.dense"),
            "output_dense": lin(f"{base}.output.dense"),
            "layernorm_before": ln(f"{base}.layernorm_before"),
            "layernorm_after": ln(f"{base}.layernorm_after"),
        }
        i += 1
    p["layernorm"] = {"scale": sd[pre + "layernorm.weight"],
                      "bias": sd[pre + "layernorm.bias"]}
    p["classifier"] = {"kernel": sd["classifier.weight"].T,
                       "bias": sd["classifier.bias"]}
    return p


# ---------------------------------------------------------------------------
# CLIP vision tower + full CLIP scorer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


CLIP_VIT_L14_VISION = CLIPVisionConfig()
TINY_CLIP_VISION = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64, projection_dim=16,
)


class CLIPVisionEncoder(nn.Module):
    """CLIP vision transformer → projected, unnormalized image embedding."""

    config: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        # reuse the text encoder layer (non-causal: zero mask)
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            num_hidden_layers=cfg.num_hidden_layers,
            layer_norm_eps=cfg.layer_norm_eps,
            hidden_act=cfg.hidden_act,
        )
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,),
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, cfg.hidden_size)),
             patches], axis=1,
        )
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(n_pos, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(n_pos)[None])
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)  # (sic — HF name)
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), dtype=jnp.float32)
        for i in range(cfg.num_hidden_layers):
            x, _, _ = CLIPEncoderLayer(text_like, dtype=self.dtype,
                                       name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)

    def init_params(self, rng):
        dummy = jnp.zeros(
            (1, self.config.image_size, self.config.image_size, 3)
        )
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, dummy)["params"]


class CLIPScorer(NamedTuple):
    """Full CLIP (text tower w/ projection + vision tower + logit scale)."""

    text_model: CLIPTextEncoder
    text_params: Any
    vision_model: CLIPVisionEncoder
    vision_params: Any
    tokenizer: Any
    logit_scale: float = 100.0  # exp(4.6052), the trained CLIP value

    @precise_matmuls  # exact-f32 scorer parity (PERF.md r4)
    def image_embeds(self, images) -> jnp.ndarray:
        x = preprocess_for_model(images, self.vision_model.config.image_size,
                                 CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
        emb = self.vision_model.apply({"params": self.vision_params}, x)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    @precise_matmuls  # exact-f32 scorer parity (PERF.md r4)
    def text_embeds(self, texts) -> jnp.ndarray:
        enc = self.tokenizer(list(texts))
        out = self.text_model.apply(
            {"params": self.text_params}, jnp.asarray(enc["input_ids"])
        )
        emb = out.pooled_output
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def logits_per_image(self, images, texts) -> jnp.ndarray:
        return self.logit_scale * self.image_embeds(images) @ self.text_embeds(texts).T

    def clip_score(self, images, texts, prefix: str = "A photo depicts ") -> np.ndarray:
        """Reference formula (util/evaluate.py:66-96):
        2.5 * logits_per_image / logit_scale = 2.5 * cosine, pairwise."""
        cos = self.image_embeds(images) * self.text_embeds(
            [prefix + t for t in texts]
        )
        return np.asarray(2.5 * cos.sum(-1))


def clip_vision_from_torch(state_dict) -> Dict[str, Any]:
    """HF CLIPModel (vision_model.* + visual_projection) → params."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    p: Dict[str, Any] = {}
    pre = "vision_model."
    p["class_embedding"] = sd[pre + "embeddings.class_embedding"]
    p["patch_embedding"] = {
        "kernel": sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
    }
    p["position_embedding"] = {
        "embedding": sd[pre + "embeddings.position_embedding.weight"]
    }
    ln = lambda n: {"scale": sd[f"{n}.weight"], "bias": sd[f"{n}.bias"]}
    lin = lambda n: {"kernel": sd[f"{n}.weight"].T, "bias": sd[f"{n}.bias"]}
    p["pre_layrnorm"] = ln(pre + "pre_layrnorm")
    p["post_layernorm"] = ln(pre + "post_layernorm")
    i = 0
    while f"{pre}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        base = f"{pre}encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": lin(f"{base}.self_attn.q_proj"),
                "k_proj": lin(f"{base}.self_attn.k_proj"),
                "v_proj": lin(f"{base}.self_attn.v_proj"),
                "out_proj": lin(f"{base}.self_attn.out_proj"),
            },
            "mlp": {"fc1": lin(f"{base}.mlp.fc1"),
                    "fc2": lin(f"{base}.mlp.fc2")},
            "layer_norm1": ln(f"{base}.layer_norm1"),
            "layer_norm2": ln(f"{base}.layer_norm2"),
        }
        i += 1
    p["visual_projection"] = {"kernel": sd["visual_projection.weight"].T}
    return p
