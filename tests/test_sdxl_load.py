"""SDXL checkpoint loading (models.sdxl.load_sdxl_pipeline): HF-diffusers
directory -> SDXLComponents, roundtripped through our own *_to_torch
exporters at tiny shapes (reference run_emcid.py loads
stable-diffusion-xl-base-1.0 via from_pretrained)."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.models.sdxl import (
    build_tiny_sdxl_pipeline, encode_prompts_sdxl, load_sdxl_pipeline,
)


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """Deserializing this module's big full-pipeline CPU AOT entries
    (SD VAE-512 attention init) segfaults inside jaxlib's compilation
    cache late in a full slow-tier run (reproduced twice at the same
    test; passes standalone, cache hit or miss).  Caching is not what
    these tests exercise — bypass it rather than crash the suite."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


def _save_tokenizer(tok, d):
    d.mkdir(parents=True, exist_ok=True)
    (d / "vocab.json").write_text(json.dumps(tok.encoder))
    merges = [""] * len(tok.bpe_ranks)
    for pair, i in tok.bpe_ranks.items():
        merges[i] = f"{pair[0]} {pair[1]}"
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))


def _text_config_json(cfg, with_projection):
    out = {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": cfg.hidden_act,
        "eos_token_id": cfg.eos_token_id,
        "architectures": ["CLIPTextModelWithProjection" if with_projection
                          else "CLIPTextModel"],
    }
    if with_projection:
        out["projection_dim"] = cfg.projection_dim
    return out


@pytest.mark.slow
def test_load_sdxl_roundtrip(tmp_path):
    import torch

    from emcid_tpu.models.convert_hf import (
        clip_text_to_torch, unet_to_torch, vae_to_torch,
    )

    xl = build_tiny_sdxl_pipeline(seed=0, words=["cat", "dog"])
    ckpt = tmp_path / "sdxl"
    _save_tokenizer(xl.tokenizer, ckpt / "tokenizer")

    def save(sub, sd, cfg=None):
        d = ckpt / sub
        d.mkdir(parents=True, exist_ok=True)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()},
                   d / "diffusion_pytorch_model.bin")
        if cfg is not None:
            (d / "config.json").write_text(json.dumps(cfg))

    save("text_encoder", clip_text_to_torch(xl.text_params),
         _text_config_json(xl.text_encoder.config, False))
    save("text_encoder_2", clip_text_to_torch(xl.text_params_2),
         _text_config_json(xl.text_encoder_2.config, True))
    # architecture configs ship as diffusers-format config.json — the
    # loader must rebuild UNetConfig/VAEConfig from them (models.configs
    # unet_config_from_diffusers / vae_config_from_diffusers)
    save("unet", unet_to_torch(xl.unet_params),
         dataclasses.asdict(xl.unet.config))
    save("vae", vae_to_torch(xl.vae_params),
         dict(dataclasses.asdict(xl.vae.config),
              scaling_factor=xl.scaling_factor))

    loaded = load_sdxl_pipeline(ckpt, dtype=jnp.float32,
                                param_dtype=jnp.float32)
    assert loaded.unet.config == xl.unet.config
    assert loaded.scaling_factor == xl.scaling_factor
    assert loaded.vae_scale == xl.vae_scale
    assert loaded.tokenizer.model_max_length == \
        xl.tokenizer.model_max_length

    # dual-encoder prompt encoding must match the original pipeline
    # (identical f32 params, same program -> tight tolerance)
    ctx_a, pool_a = encode_prompts_sdxl(xl, ["a photo of cat"])
    ctx_b, pool_b = encode_prompts_sdxl(loaded, ["a photo of cat"])
    np.testing.assert_allclose(np.asarray(ctx_a, np.float32),
                               np.asarray(ctx_b, np.float32),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool_a, np.float32),
                               np.asarray(pool_b, np.float32),
                               rtol=1e-5, atol=1e-6)

    # bf16 param_dtype: every float leaf is bf16-resident (the 16 GB v5e
    # requirement measured in PERF.md round 4)
    import jax

    loaded16 = load_sdxl_pipeline(ckpt)
    for leaf in jax.tree.leaves(loaded16.unet_params):
        a = np.asarray(leaf)
        assert a.dtype != np.float32, "f32 leaf survived param_dtype=bf16"


@pytest.mark.slow
def test_load_sd_pipeline_reads_checkpoint_configs(tmp_path):
    """load_pipeline (SD leg) rebuilds the UNet/VAE architecture from the
    checkpoint's own diffusers config.json instead of assuming SD-v1.4."""
    import torch

    from emcid_tpu.models.convert_hf import (
        clip_text_to_torch, unet_to_torch, vae_to_torch,
    )
    from emcid_tpu.models.loader import build_tiny_pipeline, load_pipeline
    from emcid_tpu.models.pipeline import generate

    sd = build_tiny_pipeline(seed=0, words=["cat", "dog"])
    ckpt = tmp_path / "sd"
    _save_tokenizer(sd.tokenizer, ckpt / "tokenizer")

    def save(sub, state, cfg=None):
        d = ckpt / sub
        d.mkdir(parents=True, exist_ok=True)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state.items()},
                   d / "diffusion_pytorch_model.bin")
        if cfg is not None:
            (d / "config.json").write_text(json.dumps(cfg))

    save("text_encoder", clip_text_to_torch(sd.text_params),
         _text_config_json(sd.text_encoder.config, False))
    save("unet", unet_to_torch(sd.unet_params),
         dataclasses.asdict(sd.unet.config))
    save("vae", vae_to_torch(sd.vae_params),
         dict(dataclasses.asdict(sd.vae.config),
              scaling_factor=sd.scaling_factor))

    loaded = load_pipeline(ckpt, dtype=jnp.float32)
    assert loaded.unet.config == sd.unet.config
    assert loaded.scaling_factor == sd.scaling_factor
    assert loaded.vae_scale == sd.vae_scale
    res = loaded.unet.config.sample_size * loaded.vae_scale
    a = generate(sd, ["a photo of cat"], [0], height=res, width=res,
                 num_inference_steps=2)
    b = generate(loaded, ["a photo of cat"], [0], height=res, width=res,
                 num_inference_steps=2)
    np.testing.assert_array_equal(a, b)


def test_cli_sdxl_checkpoint_dir_arg_error(tmp_path):
    """The SDXL CLI leg points at load_sdxl_pipeline now (was a stub that
    always SystemExit'd for checkpoint dirs)."""
    from emcid_tpu.cli.run_emcid import main

    inst = tmp_path / "inst.json"
    inst.write_text(json.dumps({
        "requests": [{"source": "cat", "dest": "dog",
                      "prompts": ["a photo of {}"], "seed_train": 0}],
        "hparams":
            "sdxl-dest_s-100_c-1.2_ly-8-11_ly2-26-31_lr-0.1_wd-8e-03"
            "_txt-align-0.01",
        "model_ckpt": "sdxl-1.0",
    }))
    with pytest.raises((FileNotFoundError, OSError)):
        # a bogus dir must fail at weight loading, not at an
        # unconditional "not supported" SystemExit
        main(["--instruction_path", str(inst),
              "--checkpoint_dir", str(tmp_path / "nonexistent"),
              "--hparams_dir", "/root/reference/hparams"])
