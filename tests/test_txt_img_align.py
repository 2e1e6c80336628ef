"""Image-side txt-img alignment (reference compute_z v1 path,
compute_z.py:1360-1775): the previously-dead hparams now steer Stage-1."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.compute_z import (
    ConceptBatch, ZOptimizer, prepare_concept_batch,
)
from emcid_tpu.engine.editor import compute_zs_for_requests
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.vision import CLIPVisionEncoder, TINY_CLIP_VISION

pytestmark = pytest.mark.slow

HP = dict(
    layers=[0, 1], clamp_norm_factor=1.5, layer_selection="all",
    fact_token="subject_last", v_num_grad_steps=3, v_lr=0.1,
    v_weight_decay=5e-4, mom2_adjustment=True, mom2_update_weight=100,
    rewrite_module_tmp="text_model.encoder.layers.{}.mlp.fc2",
    layer_module_tmp="text_model.encoder.layers.{}",
    mlp_module_tmp="text_model.encoder.layers.{}.mlp",
    attn_module_tmp="text_model.encoder.layers.{}.self_attn",
    ln_f_module="text_model.final_layer_norm",
    mom2_dataset="ccs_filtered", mom2_n_samples=100,
    mom2_dtype="float32", objective="ablate-dest", esd_mu="None",
)


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline()


def _batch(comps, hp, rng, C=2):
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": f"w{i}",
             "dest": f"w{i + 1}"} for i in range(C)]
    arrays, _, _ = prepare_concept_batch(comps.tokenizer, reqs, hp)
    mean = rng.randn(C, 1, 2, 8, 8, 4).astype(np.float32) * 0.1
    logvar = np.full(mean.shape, -6.0, np.float32)
    return ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(mean),
        latents_logvar=jnp.asarray(logvar),
    ), reqs


def test_tia_changes_trajectory(comps):
    rng = np.random.RandomState(0)
    hp = EMCIDHyperParams.from_dict(
        dict(HP, txt_img_align_scale_factor=5.0,
             txt_img_align_loss_metric="l2"))
    batch, _ = _batch(comps, hp, rng)
    H = comps.text_encoder.config.hidden_size
    proj = rng.randn(H, 16).astype(np.float32)
    emb = rng.randn(2, 2, 16).astype(np.float32)

    optz = ZOptimizer(comps.text_encoder, comps.unet, comps.schedule,
                      hp, layer=1, text_projection=proj)
    zs_plain, *_ = optz.run(comps.text_params, comps.unet_params, batch,
                            jax.random.PRNGKey(0))
    zs_tia, *_ = optz.run(comps.text_params, comps.unet_params, batch,
                          jax.random.PRNGKey(0),
                          dest_img_emb=emb,
                          tia_weight=np.ones(2, np.float32))
    assert not np.allclose(np.asarray(zs_plain), np.asarray(zs_tia)), \
        "txt_img_align term must alter the optimization trajectory"
    # zero per-concept weight disables the term exactly
    zs_w0, *_ = optz.run(comps.text_params, comps.unet_params, batch,
                         jax.random.PRNGKey(0),
                         dest_img_emb=emb,
                         tia_weight=np.zeros(2, np.float32))
    np.testing.assert_allclose(np.asarray(zs_w0), np.asarray(zs_plain),
                               rtol=1e-5, atol=1e-6)


def test_tia_cos_metric_runs(comps):
    rng = np.random.RandomState(1)
    hp = EMCIDHyperParams.from_dict(
        dict(HP, txt_img_align_scale_factor=1.0,
             txt_img_align_loss_metric="cos"))
    batch, _ = _batch(comps, hp, rng)
    H = comps.text_encoder.config.hidden_size
    optz = ZOptimizer(comps.text_encoder, comps.unet, comps.schedule,
                      hp, layer=1,
                      text_projection=rng.randn(H, 16).astype(np.float32))
    zs, *_ = optz.run(comps.text_params, comps.unet_params, batch,
                      jax.random.PRNGKey(0),
                      dest_img_emb=rng.randn(2, 2, 16).astype(np.float32))
    assert np.isfinite(np.asarray(zs)).all()


def test_editor_routes_tia_and_refuses_without_clip(comps):
    hp = EMCIDHyperParams.from_dict(
        dict(HP, txt_img_align_scale_factor=0.01))
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "w0",
             "dest": "w1", "seed_train": 0, "txt_img_align": True}]
    with pytest.raises(ValueError, match="clip_align"):
        compute_zs_for_requests(comps, reqs, hp, verbose=False)

    vision = CLIPVisionEncoder(TINY_CLIP_VISION)
    vp = vision.init_params(jax.random.PRNGKey(3))
    H = comps.text_encoder.config.hidden_size
    proj = np.random.RandomState(2).randn(
        H, TINY_CLIP_VISION.projection_dim).astype(np.float32)
    zs = compute_zs_for_requests(
        comps, reqs, hp, clip_align=(vision, vp, proj),
        num_inference_steps=2, verbose=False)
    assert zs.shape[0] == 1 and np.isfinite(zs).all()


def test_editor_tia_inactive_without_flag(comps):
    """Scale set but no request flag: plain path, no clip needed
    (reference routes per-request)."""
    hp = EMCIDHyperParams.from_dict(
        dict(HP, txt_img_align_scale_factor=0.01))
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "w0",
             "dest": "w1", "seed_train": 0}]
    zs = compute_zs_for_requests(comps, reqs, hp, num_inference_steps=2,
                                 verbose=False)
    assert zs.shape[0] == 1


def test_mixed_block_keeps_source_images_for_unflagged(comps):
    """In a block where only some requests carry txt_img_align, the
    unflagged requests must train on SOURCE-prompt images (main path),
    not the flagged requests' dest images."""
    from emcid_tpu.engine.training_images import training_latents_for_requests

    reqs = [
        {"prompts": ["a photo of {}"], "source": "w1", "dest": "w2",
         "seed_train": 1, "txt_img_align": True},
        {"prompts": ["a photo of {}"], "source": "w3", "dest": "w4",
         "seed_train": 2},
    ]
    hp = type("HP", (), {"samples_per_prompt": 1})()
    kw = dict(height=16, width=16, num_inference_steps=2, verbose=False)
    mixed_m, _ = training_latents_for_requests(
        comps, reqs, hp, use_dest_prompts=[True, False], **kw)
    src_m, _ = training_latents_for_requests(
        comps, reqs, hp, use_dest_prompts=False, **kw)
    dest_m, _ = training_latents_for_requests(
        comps, reqs, hp, use_dest_prompts=True, **kw)
    # flagged request: dest images; unflagged: source images
    np.testing.assert_array_equal(mixed_m[0], dest_m[0])
    np.testing.assert_array_equal(mixed_m[1], src_m[1])
    assert not np.array_equal(mixed_m[1], dest_m[1])
