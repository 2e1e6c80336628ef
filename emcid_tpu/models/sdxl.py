"""SDXL pipeline components: dual text encoders + conditioned UNet.

SDXL conditioning (reference pipelines via diffusers; SURVEY.md §1 models):
* context = concat(penultimate hidden of CLIP-L, penultimate hidden of
  OpenCLIP-bigG) → (B, 77, 2048);
* added conds: ``text_embeds`` = bigG pooled+projected (B, 1280),
  ``time_ids`` = (orig_size, crop, target_size) sextuple.

The editing engine treats each encoder independently (hparams ``layers`` /
``layers_2``, separate stats dirs XL_STATS_DIR1/2 — reference
emcid_main.py:1085-1425).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.clip_text import CLIPTextEncoder
from emcid_tpu.models.configs import (
    SDXL_TEXT_1,
    SDXL_TEXT_2,
    sdxl_unet,
    sdxl_vae,
)
from emcid_tpu.models.scheduler import (
    Schedule,
    ddim_step,
    ddim_timesteps,
    sd_schedule,
)
from emcid_tpu.models.unet import UNet2DCondition
from emcid_tpu.models.vae import AutoencoderKL


@dataclass
class SDXLComponents:
    tokenizer: Any  # shared CLIP BPE (tokenizer_2 differs only in pad token)
    text_encoder: Any
    text_params: Any
    text_encoder_2: Any
    text_params_2: Any
    unet: Any
    unet_params: Any
    vae: Any
    vae_params: Any
    schedule: Schedule = field(default_factory=sd_schedule)
    scaling_factor: float = 0.13025
    latent_channels: int = 4
    vae_scale: int = 8

    def replace_text_params(self, p1=None, p2=None) -> "SDXLComponents":
        import dataclasses

        kw = {}
        if p1 is not None:
            kw["text_params"] = p1
        if p2 is not None:
            kw["text_params_2"] = p2
        return dataclasses.replace(self, **kw)

    def encoder(self, which: int) -> Tuple[Any, Any]:
        if which == 1:
            return self.text_encoder, self.text_params
        return self.text_encoder_2, self.text_params_2


def encode_prompts_sdxl(
    components: SDXLComponents,
    prompts: Sequence[str],
    params_1=None,
    params_2=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompts → (context (B, S, 2048), pooled (B, 1280)).

    Penultimate hidden states: layer_out of the second-to-last encoder layer
    (clip-skip convention), no final LN.
    """
    tok = components.tokenizer
    enc = tok(list(prompts), padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    ids = jnp.asarray(enc["input_ids"])
    p1 = params_1 if params_1 is not None else components.text_params
    p2 = params_2 if params_2 is not None else components.text_params_2
    n1 = components.text_encoder.config.num_hidden_layers
    n2 = components.text_encoder_2.config.num_hidden_layers
    out1 = components.text_encoder.apply(
        {"params": p1}, ids, capture=("layer_out",), stop_at_layer=n1 - 2,
    )
    h1 = out1.taps["layer_out"][n1 - 2]
    out2_full = components.text_encoder_2.apply({"params": p2}, ids)
    out2 = components.text_encoder_2.apply(
        {"params": p2}, ids, capture=("layer_out",), stop_at_layer=n2 - 2,
    )
    h2 = out2.taps["layer_out"][n2 - 2]
    context = jnp.concatenate([h1, h2], axis=-1)
    return context, out2_full.pooled_output


def sdxl_time_ids(batch: int, height: int, width: int,
                  crop: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    ids = jnp.asarray(
        [height, width, crop[0], crop[1], height, width], dtype=jnp.float32
    )
    return jnp.broadcast_to(ids, (batch, 6))


_SDXL_SAMPLER_CACHE: Dict[Any, Any] = {}


def sample_latents_sdxl(
    components: SDXLComponents,
    prompts: Sequence[str],
    seeds: Sequence[int],
    *,
    negative_prompts: Optional[Sequence[str]] = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 5.0,
    height: int = 1024,
    width: int = 1024,
    sampler: str = "ddim",
    cfg_interval: float = 1.0,
) -> jnp.ndarray:
    """CFG sampling with SDXL added conditions, one scanned program.
    ``sampler``: ddim (default) / pndm / dpm++ (see models.scheduler).
    ``cfg_interval < 1`` truncates guidance to the first fraction of steps
    (same lever + semantics as models.pipeline.sample_latents)."""
    from emcid_tpu.models.pipeline import initial_latents

    if not 0.0 < cfg_interval <= 1.0:
        raise ValueError(f"cfg_interval={cfg_interval} must be in (0, 1]")

    ctx_c, pool_c = encode_prompts_sdxl(components, prompts)
    neg = negative_prompts if negative_prompts is not None else [""] * len(prompts)
    ctx_u, pool_u = encode_prompts_sdxl(components, neg)
    latents = initial_latents(seeds, height, width,
                              components.latent_channels,
                              components.vae_scale)
    B = latents.shape[0]
    tids = sdxl_time_ids(B, height, width)

    from emcid_tpu.runtime import trace_env_knobs

    key = (components.unet.config, num_inference_steps,
           components.schedule.num_train_timesteps, sampler,
           cfg_interval, trace_env_knobs())
    if key not in _SDXL_SAMPLER_CACHE:
        ts = ddim_timesteps(components.schedule, num_inference_steps)
        ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
        n_head = (max(1, int(round(cfg_interval * len(ts))))
                  if cfg_interval < 1.0 else None)
        unet = components.unet
        schedule = components.schedule

        @jax.jit
        def run(unet_params, latents, ctx_c, ctx_u, pool_c, pool_u, tids, g):
            B = latents.shape[0]
            ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
            added = {
                "text_embeds": jnp.concatenate([pool_u, pool_c], axis=0),
                "time_ids": jnp.concatenate([tids, tids], axis=0),
            }

            added_c = {"text_embeds": pool_c, "time_ids": tids}

            def eps_cond(lat, t):
                return unet.apply(
                    {"params": unet_params}, lat,
                    jnp.broadcast_to(t, (B,)), ctx_c, added_c,
                ).sample

            def unet_eps(lat, t):
                lat2 = jnp.concatenate([lat, lat], axis=0)
                eps2 = unet.apply(
                    {"params": unet_params}, lat2,
                    jnp.broadcast_to(t, (2 * B,)), ctx2, added,
                ).sample
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                return eps_u + g * (eps_c - eps_u)

            from emcid_tpu.models.scheduler import scan_sampler

            return scan_sampler(sampler, schedule, unet_eps, latents,
                                ts, ts_prev, unet_eps_tail=eps_cond,
                                n_head=n_head)

        _SDXL_SAMPLER_CACHE[key] = run
    return _SDXL_SAMPLER_CACHE[key](
        components.unet_params, latents, ctx_c, ctx_u, pool_c, pool_u, tids,
        jnp.float32(guidance_scale),
    )


def generate_sdxl(components: SDXLComponents, prompts, seeds,
                  **kwargs) -> np.ndarray:
    from emcid_tpu.models.pipeline import decode_latents

    lat = sample_latents_sdxl(components, list(prompts), list(seeds), **kwargs)
    # reuse the SD decode path (same VAE interface, different scaling factor)
    from emcid_tpu.models.pipeline import SDComponents

    fake = SDComponents(
        tokenizer=components.tokenizer,
        text_encoder=components.text_encoder,
        text_params=components.text_params,
        unet=components.unet, unet_params=components.unet_params,
        vae=components.vae, vae_params=components.vae_params,
        scaling_factor=components.scaling_factor,
        vae_scale=components.vae_scale,
    )
    return decode_latents(fake, lat)


def load_sdxl_pipeline(ckpt_dir, dtype=jnp.bfloat16,
                       param_dtype=jnp.bfloat16,
                       unet_config=None, vae_config=None) -> SDXLComponents:
    """HF-diffusers-format SDXL checkpoint directory → SDXLComponents
    (reference run_emcid.py SDXL branch loads
    stabilityai/stable-diffusion-xl-base-1.0 via from_pretrained).

    ``param_dtype`` defaults to bf16: f32 SDXL params are 10.4 GB for the
    2.6B UNet alone and starve a 16 GB v5e before any activation is
    allocated (measured — every phase of the first SDXL probe
    RESOURCE_EXHAUSTED; PERF.md round 4).  The cast happens on the HOST
    after conversion, so no 15.6 GB device transient either.  Pass
    ``param_dtype=jnp.float32`` to keep f32 master weights when HBM
    allows (multi-chip, or the 95 GB v5p).
    """
    import json as _json

    from emcid_tpu.models.configs import CLIPTextConfig
    from emcid_tpu.models.convert_hf import (
        clip_text_from_torch, unet_from_torch, vae_from_torch,
    )
    from emcid_tpu.models.loader import _load_torch_state_dict
    from emcid_tpu.text.tokenizer import CLIPBPETokenizer

    from pathlib import Path

    ckpt = Path(ckpt_dir)

    def text_cfg(sub, default):
        f = ckpt / sub / "config.json"
        if not f.exists():
            return default
        with open(f) as fh:
            c = _json.load(fh)
        return CLIPTextConfig(
            vocab_size=c.get("vocab_size", default.vocab_size),
            hidden_size=c.get("hidden_size", default.hidden_size),
            intermediate_size=c.get("intermediate_size",
                                    default.intermediate_size),
            num_hidden_layers=c.get("num_hidden_layers",
                                    default.num_hidden_layers),
            num_attention_heads=c.get("num_attention_heads",
                                      default.num_attention_heads),
            max_position_embeddings=c.get("max_position_embeddings", 77),
            hidden_act=c.get("hidden_act", default.hidden_act),
            eos_token_id=c.get("eos_token_id", default.eos_token_id),
            projection_dim=(c.get("projection_dim", default.projection_dim)
                            if default.projection_dim is not None or
                            "WithProjection" in str(c.get("architectures"))
                            else None),
        )

    def cast(tree):
        def one(x):
            a = np.asarray(x)
            if np.issubdtype(a.dtype, np.floating):
                a = a.astype(param_dtype)
            return a
        return jax.tree.map(one, tree)

    cfg1 = text_cfg("text_encoder", SDXL_TEXT_1)
    cfg2 = text_cfg("text_encoder_2", SDXL_TEXT_2)
    # context length follows the encoder (77 for real SDXL; smaller for
    # synthetic checkpoints in tests)
    tokenizer = CLIPBPETokenizer.from_pretrained_dir(
        ckpt / "tokenizer",
        model_max_length=cfg1.max_position_embeddings)
    text1 = CLIPTextEncoder(cfg1, dtype=dtype)
    p1 = cast(clip_text_from_torch(
        _load_torch_state_dict(ckpt / "text_encoder")))
    text2 = CLIPTextEncoder(cfg2, dtype=dtype)
    p2 = cast(clip_text_from_torch(
        _load_torch_state_dict(ckpt / "text_encoder_2")))

    if unet_config is None:
        ucf = ckpt / "unet" / "config.json"
        if ucf.exists():
            from emcid_tpu.models.configs import unet_config_from_diffusers

            with open(ucf) as fh:
                unet_config = unet_config_from_diffusers(_json.load(fh))
        else:
            unet_config = sdxl_unet()
    if vae_config is None:
        vcf = ckpt / "vae" / "config.json"
        if vcf.exists():
            from emcid_tpu.models.configs import vae_config_from_diffusers

            with open(vcf) as fh:
                vae_config = vae_config_from_diffusers(_json.load(fh))
        else:
            vae_config = sdxl_vae()
    unet = UNet2DCondition(unet_config, dtype=dtype)
    # template init on the host CPU backend: eager device init of the 2.6B
    # tree would both round-trip the tunnel and waste HBM on f32 templates
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        unet_template = unet.init_params(jax.random.PRNGKey(0))
        vae = AutoencoderKL(vae_config, dtype=dtype)
        vae_template = vae.init_params(jax.random.PRNGKey(0),
                                       image_size=128)
    pu = cast(unet_from_torch(_load_torch_state_dict(ckpt / "unet"),
                              unet_template))
    pv = cast(vae_from_torch(_load_torch_state_dict(ckpt / "vae"),
                             vae_template))
    # spatial scale and latent scaling follow the VAE architecture, not the
    # SDXL defaults (synthetic/tiny checkpoints have fewer down blocks);
    # the checkpoint's own vae/config.json wins when present (diffusers
    # stores scaling_factor there)
    vae_scale = 2 ** (len(vae.config.block_out_channels) - 1)
    scaling = vae.config.scaling_factor
    vae_cfg_file = ckpt / "vae" / "config.json"
    if vae_cfg_file.exists():
        with open(vae_cfg_file) as fh:
            scaling = _json.load(fh).get("scaling_factor", scaling)
    return SDXLComponents(
        tokenizer=tokenizer,
        text_encoder=text1, text_params=p1,
        text_encoder_2=text2, text_params_2=p2,
        unet=unet, unet_params=pu, vae=vae, vae_params=pv,
        scaling_factor=scaling,
        vae_scale=vae_scale,
    )


def build_tiny_sdxl_pipeline(seed: int = 0, words=None) -> SDXLComponents:
    """Tiny random SDXL-style pipeline: two small encoders (16+16 → 32
    context), text_time UNet, vae_scale 2."""
    import dataclasses

    from emcid_tpu.models.configs import CLIPTextConfig, UNetConfig, tiny_vae
    from emcid_tpu.text.tokenizer import make_tiny_tokenizer

    tokenizer = make_tiny_tokenizer(
        list(words or []) + [f"w{i}" for i in range(16)]
        + ["photo", "of", "a", "an", "image", "cat", "dog"],
        model_max_length=16,
    )
    cfg1 = CLIPTextConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=16,
        intermediate_size=32, num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=tokenizer.eos_token_id,
    )
    cfg2 = CLIPTextConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=16,
        intermediate_size=32, num_hidden_layers=4, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="gelu",
        projection_dim=16, eos_token_id=tokenizer.eos_token_id,
    )
    unet_cfg = UNetConfig(
        sample_size=8, block_out_channels=(32, 64), layers_per_block=1,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=(4, 4), transformer_layers_per_block=(1, 1),
        cross_attention_dim=32, norm_num_groups=8,
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,
    )
    text1 = CLIPTextEncoder(cfg1)
    text2 = CLIPTextEncoder(cfg2)
    unet = UNet2DCondition(unet_cfg)
    vae = AutoencoderKL(tiny_vae())
    k = jax.random.PRNGKey(seed)
    return SDXLComponents(
        tokenizer=tokenizer,
        text_encoder=text1,
        text_params=text1.init_params(k, seq_len=16),
        text_encoder_2=text2,
        text_params_2=text2.init_params(jax.random.fold_in(k, 1), seq_len=16),
        unet=unet,
        unet_params=unet.init_params(jax.random.fold_in(k, 2), context_len=16),
        vae=vae,
        vae_params=vae.init_params(jax.random.fold_in(k, 3), image_size=16),
        vae_scale=2,
    )


def build_random_sdxl_pipeline(dtype=jnp.bfloat16, tokenizer=None,
                               seed: int = 0) -> SDXLComponents:
    """Full-architecture SDXL random init (CLIP-L + bigG + 2.6B UNet)."""
    from emcid_tpu.text.tokenizer import make_tiny_tokenizer

    if tokenizer is None:
        tokenizer = make_tiny_tokenizer(
            [f"w{i}" for i in range(64)] + ["photo", "of", "a"],
            model_max_length=77,
        )
    text1 = CLIPTextEncoder(SDXL_TEXT_1, dtype=dtype)
    text2 = CLIPTextEncoder(SDXL_TEXT_2, dtype=dtype)
    unet = UNet2DCondition(sdxl_unet(), dtype=dtype)
    vae = AutoencoderKL(sdxl_vae(), dtype=dtype)
    k = jax.random.PRNGKey(seed)
    return SDXLComponents(
        tokenizer=tokenizer,
        text_encoder=text1, text_params=text1.init_params(k),
        text_encoder_2=text2,
        text_params_2=text2.init_params(jax.random.fold_in(k, 1)),
        unet=unet, unet_params=unet.init_params(jax.random.fold_in(k, 2)),
        vae=vae,
        vae_params=vae.init_params(jax.random.fold_in(k, 3), image_size=128),
    )
