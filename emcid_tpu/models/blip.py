"""BLIP image-text-matching model (Flax) — the native replacement for the
torch seam in evals/blip.py.

The reference scores causal-trace images with HF's
``BlipForImageTextRetrieval`` ITM head (util/evaluate.py:189-248:
``softmax(itm_score)[:, 1]`` on "A photo depicts {text}").  This is the same
model natively: a pre-LN ViT vision tower (fused-qkv attention), a BERT-style
post-LN text encoder whose every layer cross-attends to the image sequence,
and the 2-way ITM head on the multimodal [CLS].

``blip_from_torch`` converts an HF BlipForImageTextRetrieval state_dict
(e.g. Salesforce/blip-itm-base-coco / -large-coco); parity against HF's
torch implementation is tested with random weights (tests/test_blip.py —
no checkpoints exist in this image).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from emcid_tpu.runtime import precise_matmuls


@dataclass(frozen=True)
class BlipVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 384
    patch_size: int = 16
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_hidden_size: int = 768
    layer_norm_eps: float = 1e-12


TINY_BLIP_VISION = BlipVisionConfig(hidden_size=24, num_hidden_layers=2,
                                    num_attention_heads=2,
                                    intermediate_size=48, image_size=32,
                                    patch_size=16)
TINY_BLIP_TEXT = BlipTextConfig(vocab_size=100, hidden_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                intermediate_size=64, encoder_hidden_size=24)


def _attn(q, k, v, heads: int, mask: Optional[jnp.ndarray] = None):
    B, N, H = q.shape
    M = k.shape[1]
    d = H // heads
    dk = k.shape[-1] // heads
    q = q.reshape(B, N, heads, d)
    k = k.reshape(B, M, heads, dk)
    v = v.reshape(B, M, heads, dk)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, heads * dk)


class BlipVisionLayer(nn.Module):
    config: BlipVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        qkv = nn.Dense(3 * cfg.hidden_size, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _attn(q, k, v, cfg.num_attention_heads)
        x = x + nn.Dense(cfg.hidden_size, name="projection")(a)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.hidden_size, name="fc2")(h)


class BlipVisionModel(nn.Module):
    """Pre-LN ViT returning the full patch sequence (BLIP cross-attends to
    every position, not just [CLS])."""

    config: BlipVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        B = pixel_values.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    name="patch_embedding")(pixel_values)
        x = x.reshape(B, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)),
                             x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, x.shape[1], cfg.hidden_size))
        x = x + pos[:, : x.shape[1]]
        for i in range(cfg.num_hidden_layers):
            x = BlipVisionLayer(cfg, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="post_layernorm")(x)

    def init_params(self, rng):
        px = jnp.zeros((1, self.config.image_size, self.config.image_size, 3))
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, px)["params"]


class BertSelfAttention(nn.Module):
    config: BlipTextConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, kv, mask):
        cfg = self.config
        q = nn.Dense(cfg.hidden_size, name="query")(x)
        k = nn.Dense(cfg.hidden_size, name="key")(kv)
        v = nn.Dense(cfg.hidden_size, name="value")(kv)
        return _attn(q, k, v, cfg.num_attention_heads, mask)


class BertLayer(nn.Module):
    """Post-LN BERT layer with cross-attention (BLIP text encoder in
    multimodal mode: every layer attends to the image sequence)."""

    config: BlipTextConfig

    @nn.compact
    def __call__(self, x, enc, self_mask, cross_mask):
        cfg = self.config
        a = BertSelfAttention(cfg, name="attention")(x, x, self_mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_ln")(
            x + nn.Dense(cfg.hidden_size, name="attention_out")(a))
        if enc is not None:
            a = BertSelfAttention(cfg, cross=True, name="crossattention")(
                x, enc, cross_mask)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="crossattention_ln")(
                x + nn.Dense(cfg.hidden_size, name="crossattention_out")(a))
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_ln")(
            x + nn.Dense(cfg.hidden_size, name="output_out")(h))


class BlipTextModel(nn.Module):
    config: BlipTextConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 encoder_hidden_states=None):
        cfg = self.config
        B, S = input_ids.shape
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = emb + pos[:S]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_ln")(x)
        self_mask = None
        if attention_mask is not None:
            self_mask = (1.0 - attention_mask[:, None, None, :]) * -1e9
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(
                x, encoder_hidden_states, self_mask, None)
        return x

    def init_params(self, rng, seq_len=8):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        enc = jnp.zeros((1, 4, self.config.encoder_hidden_size))
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, ids, jnp.ones((1, seq_len)), enc)["params"]


class BlipITM(nn.Module):
    """vision tower + multimodal text encoder + 2-way ITM head."""

    vision_config: BlipVisionConfig
    text_config: BlipTextConfig

    def setup(self):
        self.vision_model = BlipVisionModel(self.vision_config)
        self.text_encoder = BlipTextModel(self.text_config)
        self.itm_head = nn.Dense(2)

    def __call__(self, pixel_values, input_ids, attention_mask=None):
        image_embeds = self.vision_model(pixel_values)
        q = self.text_encoder(input_ids, attention_mask, image_embeds)
        return self.itm_head(q[:, 0, :])  # (B, 2) logits

    def init_params(self, rng, seq_len=8):
        px = jnp.zeros((1, self.vision_config.image_size,
                        self.vision_config.image_size, 3))
        ids = jnp.zeros((1, seq_len), jnp.int32)
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, px, ids, jnp.ones((1, seq_len)))["params"]


# ---------------------------------------------------------------------------
# torch conversion (HF BlipForImageTextRetrieval naming)
# ---------------------------------------------------------------------------


def blip_from_torch(state_dict: Dict[str, Any],
                    vision_config: BlipVisionConfig,
                    text_config: BlipTextConfig) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {"vision_model": {}, "text_encoder": {},
                         "itm_head": {}}

    def dense(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"].T),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    v = p["vision_model"]
    v["patch_embedding"] = {
        "kernel": jnp.asarray(
            sd["vision_model.embeddings.patch_embedding.weight"]
            .transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(
            sd["vision_model.embeddings.patch_embedding.bias"]),
    }
    v["class_embedding"] = jnp.asarray(
        sd["vision_model.embeddings.class_embedding"])
    v["position_embedding"] = jnp.asarray(
        sd["vision_model.embeddings.position_embedding"])
    for i in range(vision_config.num_hidden_layers):
        t = f"vision_model.encoder.layers.{i}"
        v[f"layers_{i}"] = {
            "layer_norm1": ln(f"{t}.layer_norm1"),
            "layer_norm2": ln(f"{t}.layer_norm2"),
            "qkv": dense(f"{t}.self_attn.qkv"),
            "projection": dense(f"{t}.self_attn.projection"),
            "fc1": dense(f"{t}.mlp.fc1"),
            "fc2": dense(f"{t}.mlp.fc2"),
        }
    v["post_layernorm"] = ln("vision_model.post_layernorm")

    t = p["text_encoder"]
    t["word_embeddings"] = {"embedding": jnp.asarray(
        sd["text_encoder.embeddings.word_embeddings.weight"])}
    t["position_embeddings"] = jnp.asarray(
        sd["text_encoder.embeddings.position_embeddings.weight"])
    t["embeddings_ln"] = ln("text_encoder.embeddings.LayerNorm")
    for i in range(text_config.num_hidden_layers):
        b = f"text_encoder.encoder.layer.{i}"
        t[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{b}.attention.self.query"),
                "key": dense(f"{b}.attention.self.key"),
                "value": dense(f"{b}.attention.self.value"),
            },
            "attention_out": dense(f"{b}.attention.output.dense"),
            "attention_ln": ln(f"{b}.attention.output.LayerNorm"),
            "crossattention": {
                "query": dense(f"{b}.crossattention.self.query"),
                "key": dense(f"{b}.crossattention.self.key"),
                "value": dense(f"{b}.crossattention.self.value"),
            },
            "crossattention_out": dense(f"{b}.crossattention.output.dense"),
            "crossattention_ln": ln(f"{b}.crossattention.output.LayerNorm"),
            "intermediate": dense(f"{b}.intermediate.dense"),
            "output_out": dense(f"{b}.output.dense"),
            "output_ln": ln(f"{b}.output.LayerNorm"),
        }
    p["itm_head"] = dense("itm_head")
    return p


# ---------------------------------------------------------------------------
# scoring (reference calculate_single_blip_score, util/evaluate.py:219-248)
# ---------------------------------------------------------------------------


class NativeBlipScorer:
    """ITM match probability P(match) = softmax(itm_logits)[:, 1]."""

    def __init__(self, model: BlipITM, params, tokenizer,
                 prefix: str = "A photo depicts "):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.prefix = prefix
        self._jit = jax.jit(precise_matmuls(
            lambda p, px, ids, m: jax.nn.softmax(
                model.apply({"params": p}, px, ids, m), axis=-1)[:, 1]))

    def itm_score(self, images, texts: Sequence[str]) -> np.ndarray:
        from emcid_tpu.models.vision import (
            CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, preprocess_for_model,
        )

        px = preprocess_for_model(images, self.model.vision_config.image_size,
                                  CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
        # truncate like the HF processor seam — a >max_position text would
        # otherwise break the positional-embedding broadcast inside jit
        enc = self.tokenizer(
            [self.prefix + t for t in texts], padding=True, truncation=True,
            max_length=self.model.text_config.max_position_embeddings,
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"], jnp.float32)
        return np.asarray(self._jit(self.params, px, ids, mask))
