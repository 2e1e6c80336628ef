"""Build SDComponents pipelines from checkpoints or by name.

The reference calls ``StableDiffusionPipeline.from_pretrained`` (hub
download).  Offline-first equivalents:

* ``load_pipeline(ckpt_dir)`` — local HF-format checkpoint directory
  (``text_encoder/``, ``unet/``, ``vae/``, ``tokenizer/`` subfolders with
  torch weights) converted to Flax params;
* ``build_random_pipeline("sd-v1.4")`` — full-architecture random init
  (perf work, dry runs);
* ``build_tiny_pipeline()`` — the test-suite fake backend.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.clip_text import CLIPTextEncoder
from emcid_tpu.models.configs import (
    CLIPTextConfig,
    SD_V14_TEXT,
    TINY_TEXT,
    sd_v14_unet,
    sd_vae,
    sdxl_unet,
    tiny_unet,
    tiny_vae,
)
from emcid_tpu.models.convert_hf import (
    clip_text_from_torch,
    unet_from_torch,
    vae_from_torch,
)
from emcid_tpu.models.pipeline import SDComponents
from emcid_tpu.models.scheduler import sd_schedule
from emcid_tpu.models.unet import UNet2DCondition
from emcid_tpu.models.vae import AutoencoderKL
from emcid_tpu.text.tokenizer import CLIPBPETokenizer, make_tiny_tokenizer


def _load_torch_state_dict(folder: Path) -> Dict[str, Any]:
    """Load torch weights from a model subfolder (.safetensors preferred)."""
    st = list(folder.glob("*.safetensors"))
    if st:
        try:
            from safetensors import safe_open

            out = {}
            for f in st:
                with safe_open(str(f), framework="np") as sf:
                    for k in sf.keys():
                        out[k] = sf.get_tensor(k)
            return out
        except ImportError:
            pass
    bins = list(folder.glob("*.bin")) + list(folder.glob("*.pt"))
    if not bins:
        raise FileNotFoundError(f"no weight files in {folder}")
    import torch

    out = {}
    for f in bins:
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        out.update({k: v.numpy() for k, v in sd.items()})
    return out


def load_pipeline(ckpt_dir, dtype=jnp.bfloat16) -> SDComponents:
    """HF-format local checkpoint directory → SDComponents."""
    ckpt = Path(ckpt_dir)

    text_cfg = SD_V14_TEXT
    cfg_file = ckpt / "text_encoder" / "config.json"
    if cfg_file.exists():
        with open(cfg_file) as f:
            c = json.load(f)
        text_cfg = CLIPTextConfig(
            vocab_size=c.get("vocab_size", 49408),
            hidden_size=c.get("hidden_size", 768),
            intermediate_size=c.get("intermediate_size", 3072),
            num_hidden_layers=c.get("num_hidden_layers", 12),
            num_attention_heads=c.get("num_attention_heads", 12),
            max_position_embeddings=c.get("max_position_embeddings", 77),
            hidden_act=c.get("hidden_act", "quick_gelu"),
            eos_token_id=c.get("eos_token_id", 49407),
        )
    # context length follows the encoder (77 for real SD; a longer
    # tokenizer pad would index past the position-embedding table)
    tokenizer = CLIPBPETokenizer.from_pretrained_dir(
        ckpt / "tokenizer",
        model_max_length=text_cfg.max_position_embeddings)
    text = CLIPTextEncoder(text_cfg, dtype=dtype)
    text_params = clip_text_from_torch(
        _load_torch_state_dict(ckpt / "text_encoder")
    )

    # architecture follows the checkpoint's own config when present
    # (SD v1.5 / v2 / finetunes share the diffusers schema)
    unet_cfg = sd_v14_unet()
    ucf = ckpt / "unet" / "config.json"
    if ucf.exists():
        from emcid_tpu.models.configs import unet_config_from_diffusers

        with open(ucf) as f:
            unet_cfg = unet_config_from_diffusers(json.load(f))
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    unet_template = unet.init_params(jax.random.PRNGKey(0))
    unet_params = unet_from_torch(
        _load_torch_state_dict(ckpt / "unet"), unet_template
    )

    vae_cfg = sd_vae()
    vcf = ckpt / "vae" / "config.json"
    if vcf.exists():
        from emcid_tpu.models.configs import vae_config_from_diffusers

        with open(vcf) as f:
            vae_cfg = vae_config_from_diffusers(json.load(f))
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    vae_template = vae.init_params(jax.random.PRNGKey(0), image_size=64)
    vae_params = vae_from_torch(_load_torch_state_dict(ckpt / "vae"),
                                vae_template)

    return SDComponents(
        tokenizer=tokenizer, text_encoder=text, text_params=text_params,
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=sd_schedule(),
        scaling_factor=vae_cfg.scaling_factor,
        vae_scale=2 ** (len(vae_cfg.block_out_channels) - 1),
    )


def build_random_pipeline(name: str = "sd-v1.4", dtype=jnp.bfloat16,
                          tokenizer=None, seed: int = 0) -> SDComponents:
    """Full-architecture random init (no weights available offline)."""
    if name not in ("sd-v1.4", "sd-v1.5"):
        raise ValueError(f"unknown pipeline {name!r}")
    if tokenizer is None:
        tokenizer = make_tiny_tokenizer(
            [f"w{i}" for i in range(64)]
            + ["photo", "of", "a", "an", "image", "painting", "by", "style",
               "artwork", "art"],
            model_max_length=77,
        )
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=dtype)
    unet = UNet2DCondition(sd_v14_unet(), dtype=dtype)
    vae = AutoencoderKL(sd_vae(), dtype=dtype)
    k = jax.random.PRNGKey(seed)
    return SDComponents(
        tokenizer=tokenizer,
        text_encoder=text, text_params=text.init_params(k),
        unet=unet, unet_params=unet.init_params(jax.random.fold_in(k, 1)),
        vae=vae, vae_params=vae.init_params(jax.random.fold_in(k, 2),
                                            image_size=64),
        schedule=sd_schedule(),
    )


def build_tiny_pipeline(seed: int = 0, words=None) -> SDComponents:
    """Tiny randomly-initialized pipeline — the test/smoke fake backend.
    vae_scale=2, 16x16 images, 8x8 latents."""
    tokenizer = make_tiny_tokenizer(
        list(words or []) + [f"w{i}" for i in range(32)]
        + ["photo", "of", "a", "an", "image", "painting", "by", "style",
           "artwork", "art", "cat", "dog", "realist", "artist", "vincent",
           "van", "gogh", "paint", "the", "in"],
        model_max_length=32,
    )
    text_cfg = CLIPTextConfig(
        vocab_size=tokenizer.vocab_size,
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, max_position_embeddings=32,
        eos_token_id=tokenizer.eos_token_id,
    )
    text = CLIPTextEncoder(text_cfg)
    unet = UNet2DCondition(tiny_unet(cross_attention_dim=32))
    vae = AutoencoderKL(tiny_vae())
    k = jax.random.PRNGKey(seed)
    return SDComponents(
        tokenizer=tokenizer,
        text_encoder=text, text_params=text.init_params(k, seq_len=32),
        unet=unet, unet_params=unet.init_params(jax.random.fold_in(k, 1),
                                                context_len=32),
        vae=vae, vae_params=vae.init_params(jax.random.fold_in(k, 2),
                                            image_size=16),
        schedule=sd_schedule(),
        vae_scale=2,
    )
