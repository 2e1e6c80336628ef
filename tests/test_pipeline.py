"""Sampling pipeline: seeded determinism, CFG, samplers, mesh sharding,
and UNet/VAE converter roundtrips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.models import CLIPTextEncoder, TINY_TEXT
from emcid_tpu.models.configs import tiny_unet, tiny_vae
from emcid_tpu.models.convert_hf import (
    unet_from_torch,
    unet_to_torch,
    vae_from_torch,
    vae_to_torch,
)
from emcid_tpu.models.pipeline import (
    SDComponents,
    decode_latents,
    encode_images,
    encode_prompts,
    generate,
    initial_latents,
    sample_latents,
)
from emcid_tpu.models.unet import UNet2DCondition
from emcid_tpu.models.vae import AutoencoderKL
from emcid_tpu.text import make_tiny_tokenizer


@pytest.fixture(scope="module")
def components():
    tok = make_tiny_tokenizer(["cat", "dog", "photo", "of", "a"],
                              model_max_length=8)
    text_cfg = TINY_TEXT
    text = CLIPTextEncoder(text_cfg)
    text_params = text.init_params(jax.random.PRNGKey(0), seq_len=8)
    unet = UNet2DCondition(tiny_unet(cross_attention_dim=text_cfg.hidden_size))
    unet_params = unet.init_params(jax.random.PRNGKey(1), context_len=8)
    vae = AutoencoderKL(tiny_vae())
    vae_params = vae.init_params(jax.random.PRNGKey(2), image_size=16)
    # tiny VAE has 2 levels -> spatial scale 2 (SD's real VAE is 8)
    return SDComponents(
        tokenizer=tok, text_encoder=text, text_params=text_params,
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        vae_scale=2,
    )


def test_encode_prompts_shape(components):
    ctx = encode_prompts(components, ["a cat", "a dog"])
    assert ctx.shape == (2, 8, 32)


def test_initial_latents_seeded():
    l1 = initial_latents([1, 2], 64, 64)
    l2 = initial_latents([1, 2], 64, 64)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.allclose(np.asarray(l1[0]), np.asarray(l1[1]))
    # seed independent of batch position (determinism contract)
    l3 = initial_latents([5, 1], 64, 64)
    np.testing.assert_array_equal(np.asarray(l3[1]), np.asarray(l1[0]))


@pytest.mark.parametrize("sampler", ["ddim", "pndm"])
def test_sample_latents_runs(components, sampler):
    lat = sample_latents(
        components, ["a cat"], [7], num_inference_steps=4,
        guidance_scale=7.5, height=16, width=16, sampler=sampler,
    )
    assert lat.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_generation_deterministic_and_prompt_sensitive(components):
    img1 = generate(components, ["a cat"], [3], num_inference_steps=3,
                    height=16, width=16)
    img2 = generate(components, ["a cat"], [3], num_inference_steps=3,
                    height=16, width=16)
    np.testing.assert_array_equal(img1, img2)
    img3 = generate(components, ["a dog"], [3], num_inference_steps=3,
                    height=16, width=16)
    assert not np.array_equal(img1, img3)
    img4 = generate(components, ["a cat"], [4], num_inference_steps=3,
                    height=16, width=16)
    assert not np.array_equal(img1, img4)
    assert img1.dtype == np.uint8 and img1.shape == (1, 16, 16, 3)


def test_guidance_scale_matters(components):
    kw = dict(num_inference_steps=3, height=16, width=16)
    a = generate(components, ["a cat"], [3], guidance_scale=1.0, **kw)
    b = generate(components, ["a cat"], [3], guidance_scale=7.5, **kw)
    assert not np.array_equal(a, b)


def test_generate_chunked_matches_single_batch(components):
    prompts = ["a cat", "a dog", "a cat of dog"]
    seeds = [1, 2, 3]
    kw = dict(num_inference_steps=3, height=16, width=16)
    whole = generate(components, prompts, seeds, **kw)
    chunked = generate(components, prompts, seeds, batch_size=2, **kw)
    np.testing.assert_array_equal(whole, chunked)


def test_posteriors_chunked_and_env_cap_match(components, monkeypatch):
    """EMCID_TPU_GEN_BATCH caps the generation batch without changing the
    result: each sample is independently seeded, so the chunked posterior
    sweep equals the single-batch one up to reduction-order float noise
    (batch shape changes XLA tiling; the uint8 image path is exactly equal
    — test_generate_chunked_matches_single_batch).  The knob exists purely
    to bound HBM for C>8 concept blocks."""
    from emcid_tpu.engine.training_images import generate_posteriors

    prompts = ["a cat", "a dog", "a cat of dog"]
    seeds = [1, 2, 3]
    kw = dict(num_inference_steps=2, height=16, width=16)
    m0, lv0 = generate_posteriors(components, prompts, seeds, **kw)
    m1, lv1 = generate_posteriors(components, prompts, seeds,
                                  batch_size=2, **kw)
    np.testing.assert_allclose(m0, m1, rtol=0, atol=1e-5)
    np.testing.assert_allclose(lv0, lv1, rtol=0, atol=1e-5)
    monkeypatch.setenv("EMCID_TPU_GEN_BATCH", "2")
    m2, lv2 = generate_posteriors(components, prompts, seeds, **kw)
    np.testing.assert_allclose(m0, m2, rtol=0, atol=1e-5)
    np.testing.assert_allclose(lv0, lv2, rtol=0, atol=1e-5)
    # the env chunking must be the same computation as explicit batch_size=2
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(lv1, lv2)
    # the env value is a CAP: a cap above n must NOT pad the batch up
    # (same program as uncapped -> bitwise equal)
    monkeypatch.setenv("EMCID_TPU_GEN_BATCH", "64")
    m3, lv3 = generate_posteriors(components, prompts, seeds, **kw)
    np.testing.assert_array_equal(m0, m3)
    np.testing.assert_array_equal(lv0, lv3)


def test_encode_images_roundtrip_shapes(components):
    imgs = np.random.RandomState(0).randint(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    lat = encode_images(components, imgs)
    assert lat.shape == (2, 8, 8, 4)
    dec = decode_latents(components, lat)
    assert dec.shape == (2, 16, 16, 3) and dec.dtype == np.uint8


def test_sharded_generation_on_mesh(components):
    """Batch-sharded sampling over the 8-device CPU mesh must equal the
    unsharded result (pure data parallelism, no cross-image coupling)."""
    from emcid_tpu.parallel import get_mesh, shard_batch

    mesh = get_mesh()
    assert mesh.devices.size == 8
    prompts = [f"a cat {i}" for i in range(8)]
    seeds = list(range(8))
    ctx = encode_prompts(components, prompts)
    lat0 = initial_latents(seeds, 16, 16, vae_scale=2)
    from emcid_tpu.models.pipeline import _get_sampler

    run = _get_sampler(components.unet, components.schedule, 3, "ddim", False)
    base = run(components.unet_params, lat0, ctx, ctx, jnp.float32(1.0))
    with mesh:
        lat_sharded = shard_batch(np.asarray(lat0), mesh)
        ctx_sharded = shard_batch(np.asarray(ctx), mesh)
        out = run(components.unet_params, lat_sharded, ctx_sharded,
                  ctx_sharded, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_unet_converter_roundtrip():
    unet = UNet2DCondition(tiny_unet())
    params = unet.init_params(jax.random.PRNGKey(0), context_len=8)
    sd = unet_to_torch(params)
    # HF-style names present
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight" in sd
    assert "time_embedding.linear_1.weight" in sd
    assert "mid_block.resnets.0.conv1.weight" in sd
    # conv weights are NCHW-oriented
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    back = unet_from_torch(sd, params)
    for (p1, l1, v1), (p2, l2, v2) in zip(
        sorted(_walk(params)), sorted(_walk(back))
    ):
        assert p1 == p2 and l1 == l2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_vae_converter_roundtrip():
    vae = AutoencoderKL(tiny_vae())
    params = vae.init_params(jax.random.PRNGKey(0), image_size=32)
    sd = vae_to_torch(params)
    assert "encoder.conv_in.weight" in sd
    assert "decoder.mid_block.attentions.0.to_q.weight" in sd
    assert "quant_conv.weight" in sd
    back = vae_from_torch(sd, params)
    flat1, flat2 = sorted(_walk(params)), sorted(_walk(back))
    assert [x[:2] for x in flat1] == [x[:2] for x in flat2]
    for (_, _, v1), (_, _, v2) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def _walk(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _walk(v, prefix + (k,))
        else:
            out.append((prefix, k, np.asarray(v)))
    return out


def test_generate_posteriors_matches_host_roundtrip(components):
    """Fused on-device decode->re-encode == generate() + uint8 + encode."""
    from emcid_tpu.engine.training_images import (
        encode_posterior, generate_posteriors,
    )

    prompts = ["a cat", "a dog", "a photo of a cat"]
    seeds = [1, 2, 3]
    kw = dict(num_inference_steps=2, guidance_scale=7.5, height=16, width=16,
              sampler="ddim")
    m1, lv1 = generate_posteriors(components, prompts, seeds, **kw)
    imgs = generate(components, prompts, seeds, **kw)
    m2, lv2 = encode_posterior(
        components, imgs.astype(np.float32) / 255.0 * 2.0 - 1.0)
    np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(lv1, lv2, rtol=1e-4, atol=1e-5)


def test_training_latents_fused_path(components):
    """training_latents_for_requests routes pure-generation blocks through
    the fused path with correct (C, Simg, P) slotting."""
    from emcid_tpu.engine.training_images import training_latents_for_requests

    class HP:
        samples_per_prompt = 2
        objective = "ablate-dest"

    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "cat",
             "dest": "dog", "seed_train": 5},
            {"prompts": ["a photo of {}", "{}"], "source": "dog",
             "dest": "cat", "seed_train": 9}]
    mean, logvar = training_latents_for_requests(
        components, reqs, HP(), height=16, width=16, num_inference_steps=2)
    assert mean.shape[:3] == (2, 2, 2)
    assert np.isfinite(mean).all() and np.isfinite(logvar).all()
    # per-(concept,sample,prompt) seeds must differ -> distinct posteriors
    assert not np.allclose(mean[0, 0, 0], mean[0, 1, 0])


def test_seeds_to_keys_matches_prngkey():
    """ADVICE r2: out-of-range seeds must keep jax.random.PRNGKey
    semantics exactly (PRNGKey itself truncates to the low 32 bits when
    x64 is off — hi word 0 — so that is the determinism contract)."""
    import jax

    from emcid_tpu.models.pipeline import seeds_to_keys

    for s in (0, 5, 2**31, -1, -12345, 2**32 + 7, 2**63 - 1):
        expect = np.asarray(jax.random.PRNGKey(s)).astype(np.uint32)
        got = seeds_to_keys([s])[0]
        np.testing.assert_array_equal(got, expect, err_msg=f"seed {s}")
