"""SDXL dual-encoder path: conditioning, generation, joint Stage-1,
two-encoder Stage-2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.sdxl import (
    apply_emcid_to_sdxl_text_encoders,
    compute_z_sdxl_text_encoders,
    encoder_hparams_view,
    execute_emcid_sd_xl_text_encoders,
)
from emcid_tpu.hparams import EMCIDXLHyperParams
from emcid_tpu.models.sdxl import (
    build_tiny_sdxl_pipeline,
    encode_prompts_sdxl,
    generate_sdxl,
    sdxl_time_ids,
)


@pytest.fixture(scope="module")
def comps():
    return build_tiny_sdxl_pipeline(words=["cat", "dog"])


def _hp(**over):
    d = {
        "layers": [0, 1], "layers_2": [1, 2], "clamp_norm_factor": 1.2,
        "layer_selection": "all", "fact_token": "subject_last",
        "mom2_update_weight": 100, "mom2_update_weight_2": 200,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "v_num_grad_steps": 3, "v_lr": 0.1,
        "v_weight_decay": 8e-3, "mom2_adjustment": True,
        "objective": "ablate-dest", "esd_mu": "None",
        "cal_text_repr_loss": True, "text_repr_loss_scale_factor": 0.01,
    }
    d.update(over)
    return EMCIDXLHyperParams.from_dict(d)


def test_encoder_hparams_view():
    hp = _hp()
    v1 = encoder_hparams_view(hp, 1)
    v2 = encoder_hparams_view(hp, 2)
    assert v1.layers == [0, 1] and v1.mom2_update_weight == 100
    assert v2.layers == [1, 2] and v2.mom2_update_weight == 200


def test_encode_prompts_sdxl(comps):
    ctx, pooled = encode_prompts_sdxl(comps, ["a cat", "a dog"])
    assert ctx.shape == (2, 16, 32)  # 16 + 16 concat
    assert pooled.shape == (2, 16)  # projected bigG pooled


def test_generate_sdxl_deterministic(comps):
    kw = dict(num_inference_steps=2, height=16, width=16)
    a = generate_sdxl(comps, ["a cat"], [1], **kw)
    b = generate_sdxl(comps, ["a cat"], [1], **kw)
    np.testing.assert_array_equal(a, b)
    c = generate_sdxl(comps, ["a dog"], [1], **kw)
    assert not np.array_equal(a, c)
    assert a.shape == (1, 16, 16, 3)


def _latents(C, rng):
    mean = rng.randn(C, 1, 3, 8, 8, 4).astype(np.float32) * 0.13
    logvar = np.full(mean.shape, -6.0, np.float32)
    return mean, logvar


REQS = [
    {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
     "source": "cat", "dest": "dog", "seed_train": 0},
]


@pytest.mark.slow
def test_sdxl_stage1_joint(comps, rng):
    hp = _hp()
    mean, logvar = _latents(1, rng)
    zs1, zs2 = compute_z_sdxl_text_encoders(
        comps, REQS, hp, mean, logvar, height=16, width=16, verbose=False)
    assert zs1.shape == (1, 1, 16) and zs2.shape == (1, 1, 16)
    assert np.isfinite(zs1).all() and np.isfinite(zs2).all()
    # deltas actually moved both encoders' targets
    zs1b, zs2b = compute_z_sdxl_text_encoders(
        comps, REQS, _hp(v_num_grad_steps=0), mean, logvar,
        height=16, width=16, verbose=False)
    assert not np.allclose(zs1, zs1b) and not np.allclose(zs2, zs2b)


@pytest.mark.slow
def test_sdxl_stage1_reference_protocol_knobs(comps, rng):
    """The Stage-1 parity wiring added after the round-4 review:
    (a) per-request txt_align gates the dual pooled-alignment term;
    (b) no_noise_loss runs the regularizer-only objective;
    (c) use_sampled_noise switches the target to the true noise;
    (d) encoder-2 consumes tokenizer_2 ids (pad 0) on the source side."""
    mean, logvar = _latents(1, rng)
    kw = dict(height=16, width=16, verbose=False)

    # (a) txt_align=False must change the optimized z vs txt_align=True
    hp = _hp(cal_text_repr_loss=True, text_repr_loss_scale_factor=0.5,
             v_num_grad_steps=3)
    on = compute_z_sdxl_text_encoders(
        comps, [dict(REQS[0], txt_align=True)], hp, mean, logvar, **kw)
    off = compute_z_sdxl_text_encoders(
        comps, [dict(REQS[0], txt_align=False)], hp, mean, logvar, **kw)
    assert not np.allclose(on[0], off[0])

    # (b)/(c): the three objectives give three different trajectories
    base = compute_z_sdxl_text_encoders(
        comps, REQS, _hp(v_num_grad_steps=3), mean, logvar, **kw)
    nn_ = compute_z_sdxl_text_encoders(
        comps, REQS, _hp(v_num_grad_steps=3, no_noise_loss=True),
        mean, logvar, **kw)
    sn = compute_z_sdxl_text_encoders(
        comps, REQS, _hp(v_num_grad_steps=3, use_sampled_noise=True),
        mean, logvar, **kw)
    assert not np.allclose(base[0], nn_[0])
    assert not np.allclose(base[0], sn[0])
    assert not np.allclose(nn_[0], sn[0])
    for z in (base, nn_, sn):
        assert np.isfinite(z[0]).all() and np.isfinite(z[1]).all()


def test_sdxl_replace_repr_fails_loudly(comps, rng):
    mean, logvar = _latents(1, rng)
    with pytest.raises(NotImplementedError, match="replace_repr"):
        compute_z_sdxl_text_encoders(
            comps, REQS, _hp(replace_repr=True), mean, logvar,
            height=16, width=16, verbose=False)


def test_sdxl_stage2_edits_both_encoders(comps, rng):
    hp = _hp()
    zs1 = rng.randn(1, 1, 16).astype(np.float32) * 0.3
    zs2 = rng.randn(1, 1, 16).astype(np.float32) * 0.3
    covs = lambda n: [
        (lambda A: A.T @ A / 100)(rng.randn(100, 32).astype(np.float32))
        for _ in range(n)
    ]
    d1, d2, edited = execute_emcid_sd_xl_text_encoders(
        comps, REQS, hp, zs1, zs2, covs(2), covs(2), verbose=False)
    from emcid_tpu.models.naming import get_weight

    for layer in hp.layers:
        name = hp.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params, name)),
            np.asarray(get_weight(comps.text_params, name)))
    for layer in hp.layers_2:
        name = hp.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params_2, name)),
            np.asarray(get_weight(comps.text_params_2, name)))
    assert set(d1) == {f"text_model.encoder.layers.{l}.mlp.fc2.weight"
                       for l in hp.layers}
    # generation changes
    kw = dict(num_inference_steps=2, height=16, width=16)
    assert not np.array_equal(
        generate_sdxl(comps, ["a photo of a cat"], [3], **kw),
        generate_sdxl(edited, ["a photo of a cat"], [3], **kw))


@pytest.mark.slow
def test_sdxl_apply_with_cache(comps, rng, tmp_path):
    hp = _hp(v_num_grad_steps=2)
    mean, logvar = _latents(1, rng)
    covs = lambda n: [
        (lambda A: A.T @ A / 100)(rng.randn(100, 32).astype(np.float32))
        for _ in range(n)
    ]
    cache = str(tmp_path / "zc") + "/"
    c1, c2 = covs(2), covs(2)
    d1, d2, edited = apply_emcid_to_sdxl_text_encoders(
        comps, REQS, hp, mean, logvar, c1, c2,
        cache_name=cache, height=16, width=16, verbose=False)
    import glob

    # reference two-file codec (emcid_main.py:1157-1227): source_X_dest_Y.npz
    # + source_X_dest_Y_2.npz, both keyed "v_star"
    files = sorted(glob.glob(cache + "*.npz"))
    assert len(files) == 2
    assert files[1].endswith("_2.npz")
    for f in files:
        assert "v_star" in np.load(f)
    # second run hits the cache (same result deterministically)
    d1b, d2b, edited2 = apply_emcid_to_sdxl_text_encoders(
        comps, REQS, hp, mean, logvar, c1, c2,
        cache_name=cache, height=16, width=16, verbose=False)
    for k in d1:
        np.testing.assert_allclose(d1[k][0], d1b[k][0], atol=1e-6)
