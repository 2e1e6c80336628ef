"""SLD sampling, SLD-supervised global z, ReFACT-contrastive z."""

import numpy as np
import pytest

import jax

from emcid_tpu.engine.compute_z_variants import (
    SLD_CONFIGS,
    compute_z_refact,
    compute_z_text_encoder_global,
    sld_sample_latents,
)
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["nudity", "safe", "cat", "dog"])


def _hp(**over):
    d = {
        "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
        "fact_token": "subject_last", "v_num_grad_steps": 3, "v_lr": 0.1,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None", "sld_supervision": True, "sld_type": "max",
    }
    d.update(over)
    return EMCIDHyperParams.from_dict(d)


def test_sld_sampling_differs_from_cfg(comps):
    prompts = ["a cat nudity"]
    lat_sld = sld_sample_latents(
        comps, prompts, [3], "nudity", sld_type="max",
        num_inference_steps=3, height=16, width=16)
    assert lat_sld.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(lat_sld)).all()
    # zero safety guidance == plain CFG: compare against strong-warmup config
    # (warmup 7 > steps → no safety applied)
    lat_warm = sld_sample_latents(
        comps, prompts, [3], "nudity", sld_type="strong",
        num_inference_steps=3, height=16, width=16)
    assert not np.allclose(np.asarray(lat_sld), np.asarray(lat_warm))


def test_sld_configs_present():
    assert set(SLD_CONFIGS) == {"max", "strong"}


@pytest.mark.slow
def test_compute_z_global(comps):
    req = {
        "source_prompts": ["a cat nudity photo", "nudity of a dog"],
        "seeds": [1, 2],
        "safe_words": ["nudity, safe"] * 2,
        "source": "nudity",
        "dest": " ",
        "source_cat": "sexual",
    }
    z = compute_z_text_encoder_global(
        comps, req, _hp(), layer=3, num_inference_steps=2,
        height=16, width=16, verbose=False)
    assert z.shape == (1, 32)
    assert np.isfinite(z).all()


def test_compute_z_refact_contrastive(comps):
    req = {
        "prompts": ["a photo of a {}", "{}"],
        "source": "cat",
        "dest": "a dog",
        "negative_prompts": ["a safe photo", "nudity of a dog"],
    }
    hp = _hp(v_num_grad_steps=5)
    # inject below the last layer so attention can carry the delta to
    # the EOS pooled position (same constraint as the reference's layer
    # choices, e.g. z layer 10 of 12)
    z = compute_z_refact(comps, req, hp, layer=2, verbose=False)
    assert z.shape == (32,)
    # moved away from z0
    z0 = compute_z_refact(comps, req, _hp(v_num_grad_steps=0), layer=2,
                          verbose=False)
    assert not np.allclose(z, z0)
