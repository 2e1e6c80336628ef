"""UCE closed-form cross-attn editing (engine/uce.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from emcid_tpu.engine.uce import (
    edit_model_uce,
    edit_text_encoder_uce,
    get_unet_weight,
    set_unet_weight,
    unet_param_path,
)
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import encode_prompts
from emcid_tpu.models.unet import cross_attn_kv_layer_names


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog", "bird"])


def test_unet_param_path():
    assert unet_param_path(
        "up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k"
    ) == ("up_blocks_1_attentions_0", "transformer_blocks_0", "attn2", "to_k")
    assert unet_param_path("mid_block.attentions.0.transformer_blocks.0.attn2.to_v") == (
        "mid_block_attentions_0", "transformer_blocks_0", "attn2", "to_v")
    assert unet_param_path(
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2"
    ) == ("down_blocks_0_attentions_0", "transformer_blocks_0", "ff", "net_2")


def test_get_set_unet_weight(comps):
    name = cross_attn_kv_layer_names(comps.unet.config)[0]
    mod = name  # names include .to_k/.to_v suffix already
    w = get_unet_weight(comps.unet_params, mod)
    assert w.ndim == 2 and w.shape[1] == 32  # context dim
    p2 = set_unet_weight(comps.unet_params, mod, np.zeros(w.shape, np.float32))
    assert float(jnp.abs(get_unet_weight(p2, mod)).sum()) == 0
    assert float(jnp.abs(get_unet_weight(comps.unet_params, mod)).sum()) > 0


def test_uce_identity_when_no_edits(comps):
    out = edit_model_uce(comps, [], [], retain_texts=None, lamb=0.5)
    for name in cross_attn_kv_layer_names(comps.unet.config):
        np.testing.assert_allclose(
            np.asarray(get_unet_weight(out.unet_params, name)),
            np.asarray(get_unet_weight(comps.unet_params, name)),
            atol=1e-5,
        )


def test_uce_replace_moves_outputs(comps):
    """With technique='replace' and a dominant erase term, the edited W maps
    the old context rows to (approximately) the old W applied to new rows."""
    edited = edit_model_uce(
        comps, ["cat"], ["dog"], technique="replace",
        lamb=0.01, erase_scale=10.0,
    )
    from emcid_tpu.engine.uce import _aligned_context_rows

    c, new_rows = _aligned_context_rows(comps, "cat", "dog")
    for name in cross_attn_kv_layer_names(comps.unet.config)[:4]:
        w_old = np.asarray(get_unet_weight(comps.unet_params, name))
        w_new = np.asarray(get_unet_weight(edited.unet_params, name))
        target = np.asarray(new_rows) @ w_old.T
        got = np.asarray(c) @ w_new.T
        base = np.asarray(c) @ w_old.T
        # edited output is much closer to the target than the original was
        assert np.linalg.norm(got - target) < 0.35 * np.linalg.norm(base - target)


def test_uce_tensor_projects_out_old_direction(comps):
    edited = edit_model_uce(comps, ["cat"], ["dog"], technique="tensor",
                            lamb=0.1, erase_scale=1.0)
    changed = 0
    for name in cross_attn_kv_layer_names(comps.unet.config):
        w_old = np.asarray(get_unet_weight(comps.unet_params, name))
        w_new = np.asarray(get_unet_weight(edited.unet_params, name))
        if not np.allclose(w_old, w_new, atol=1e-6):
            changed += 1
    assert changed == len(cross_attn_kv_layer_names(comps.unet.config))


def test_uce_mom2_variant_runs(comps, rng):
    A = rng.randn(128, 32).astype(np.float32)
    C = A.T @ A / 128
    edited = edit_model_uce(
        comps, ["cat"], ["dog"], mom2_cov=C, preserve_scale=0.5,
        mom2_lamb2=2.0,
    )
    name = cross_attn_kv_layer_names(comps.unet.config)[0]
    assert not np.allclose(
        np.asarray(get_unet_weight(edited.unet_params, name)),
        np.asarray(get_unet_weight(comps.unet_params, name)),
    )


def test_uce_retain_texts_reduce_drift(comps):
    """Retain terms must pull the solution back toward preserving the
    retained context's outputs."""
    free = edit_model_uce(comps, ["cat"], ["dog"], technique="replace",
                          lamb=0.01, erase_scale=5.0)
    kept = edit_model_uce(comps, ["cat"], ["dog"], retain_texts=["bird"],
                          technique="replace", lamb=0.01, erase_scale=5.0,
                          preserve_scale=50.0)
    ctx = np.asarray(encode_prompts(comps, ["bird"])[0], np.float32)
    name = cross_attn_kv_layer_names(comps.unet.config)[0]
    w0 = np.asarray(get_unet_weight(comps.unet_params, name))
    drift_free = np.linalg.norm(ctx @ (np.asarray(get_unet_weight(free.unet_params, name)) - w0).T)
    drift_kept = np.linalg.norm(ctx @ (np.asarray(get_unet_weight(kept.unet_params, name)) - w0).T)
    assert drift_kept < drift_free


def test_text_encoder_uce(comps):
    from emcid_tpu.hparams import EMCIDHyperParams

    hp = EMCIDHyperParams.from_dict({
        "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
        "fact_token": "subject_last", "v_num_grad_steps": 1, "v_lr": 0.1,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs", "mom2_n_samples": 10, "mom2_dtype": "float32",
        "objective": "ablate-dest", "esd_mu": "None",
    })
    edited = edit_text_encoder_uce(comps, ["cat"], ["dog"], hp)
    from emcid_tpu.models.naming import get_weight

    for layer in hp.layers:
        name = hp.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params, name)),
            np.asarray(get_weight(comps.text_params, name)),
        )
