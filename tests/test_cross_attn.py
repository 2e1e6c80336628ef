"""Cross-attn K/V EMCID editing mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.engine.cross_attn import (
    apply_emcid_to_cross_attn,
    compute_z_unet_x_kv,
    execute_emcid_cross_attn,
    get_cross_attn_keys,
    layer_stats_cross_attn_kv,
)
from emcid_tpu.engine.uce import get_unet_weight
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import generate
from emcid_tpu.models.unet import cross_attn_kv_layer_names


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog"])


def _hp(**over):
    d = {
        "layers": [3], "clamp_norm_factor": 1.5, "layer_selection": "all",
        "fact_token": "subject_last", "v_num_grad_steps": 2, "v_lr": 0.1,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None",
    }
    d.update(over)
    return EMCIDHyperParams.from_dict(d)


REQS = [{"prompts": ["a photo of a {}", "{}"], "source": "cat",
         "dest": "dog", "seed_train": 0}]


def test_keys_are_text_states(comps):
    keys, batch = get_cross_attn_keys(comps, REQS)
    assert keys.shape == (1, 1, 32)
    # manual: final hidden at the subject token, averaged over prompts
    hidden = comps.text_encoder.apply(
        {"params": comps.text_params}, jnp.asarray(batch.input_ids)
    ).last_hidden_state
    manual = np.mean(
        [np.asarray(hidden[p, batch.lookup_indices[p, 0]]) for p in range(2)],
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(keys[0, 0]), manual, atol=1e-5)


def test_layer_stats_cross_attn(comps, tmp_path):
    captions = [f"a photo of a cat {i}" for i in range(10)]
    name = cross_attn_kv_layer_names(comps.unet.config)[0]
    stat = layer_stats_cross_attn_kv(
        comps, name, captions=captions, stats_dir=tmp_path, sample_size=10)
    C = np.asarray(stat.mom2.moment())
    assert C.shape == (32, 32)
    # cached reload
    stat2 = layer_stats_cross_attn_kv(
        comps, name, captions=None, stats_dir=tmp_path, sample_size=10)
    np.testing.assert_allclose(np.asarray(stat2.mom2.moment()), C, rtol=1e-6)


def test_compute_z_unet_x_kv(comps, rng):
    # the reference x-kv Stage-1 supports ONLY esd / SLD supervision
    # (compute_z.py:2583-2605)
    hp = _hp(objective="esd", esd_mu=1.0)
    mean = rng.randn(1, 2, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    out = compute_z_unet_x_kv(comps, REQS[0], hp, mean, logvar, verbose=False)
    names = cross_attn_kv_layer_names(comps.unet.config)
    assert set(out) == set(names)
    for n in names:
        w = get_unet_weight(comps.unet_params, n)
        assert out[n].shape == (1, w.shape[0])
        assert np.isfinite(out[n]).all()


@pytest.mark.slow
def test_compute_z_unet_x_kv_sld(comps, rng):
    """SLD supervision branch: needs request safe_words; produces targets
    different from esd (reference compute_z.py:2583-2601)."""
    mean = rng.randn(1, 2, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    req = dict(REQS[0], safe_words="a safe photo of a dog")
    import jax

    sld = compute_z_unet_x_kv(
        comps, req, _hp(sld_supervision=True, sld_type="strong"),
        mean, logvar, rng=jax.random.PRNGKey(0), verbose=False)
    esd = compute_z_unet_x_kv(
        comps, req, _hp(objective="esd", esd_mu=1.0),
        mean, logvar, rng=jax.random.PRNGKey(0), verbose=False)
    names = cross_attn_kv_layer_names(comps.unet.config)
    assert set(sld) == set(names)
    assert any(not np.allclose(sld[n], esd[n]) for n in names)
    for n in names:
        assert np.isfinite(sld[n]).all()


def test_compute_z_unet_x_kv_rejects_unsupported_objective(comps, rng):
    mean = rng.randn(1, 2, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="supervision"):
        compute_z_unet_x_kv(comps, REQS[0], _hp(), mean, logvar,
                            verbose=False)


def test_execute_cross_attn_solves(comps, rng):
    hp = _hp()
    names = cross_attn_kv_layer_names(comps.unet.config)
    keys, _ = get_cross_attn_keys(comps, REQS)
    A = rng.randn(100, 32).astype(np.float32)
    cov = A.T @ A / 100 * 0.01
    # target = current output + a shift
    zs_dict = {}
    for n in names:
        w = np.asarray(get_unet_weight(comps.unet_params, n), np.float32)
        cur = np.asarray(keys[0]) @ w.T
        zs_dict[n] = (cur + 0.3)[None]  # (R=1, T=1, out)
    deltas, edited = execute_emcid_cross_attn(
        comps, REQS, hp, zs_dict, cov, verbose=False)
    assert len(deltas) == len(names)
    # edited outputs move toward targets
    for n in names[:4]:
        w_new = np.asarray(get_unet_weight(edited.unet_params, n), np.float32)
        w_old = np.asarray(get_unet_weight(comps.unet_params, n), np.float32)
        cur_new = np.asarray(keys[0]) @ w_new.T
        err_new = np.abs(cur_new - zs_dict[n][0]).mean()
        err_old = np.abs(np.asarray(keys[0]) @ w_old.T - zs_dict[n][0]).mean()
        assert err_new < err_old
    # generation changes
    kw = dict(num_inference_steps=2, height=16, width=16)
    assert not np.array_equal(
        generate(comps, ["a photo of a cat"], [1], **kw),
        generate(edited, ["a photo of a cat"], [1], **kw))


@pytest.mark.slow
def test_apply_cross_attn_with_cache(comps, rng, tmp_path):
    hp = _hp(objective="esd", esd_mu=1.0)
    mean = rng.randn(1, 1, 2, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    captions = [f"caption {i} of a cat" for i in range(8)]
    cache = str(tmp_path / "xkv") + "/"
    deltas, edited = apply_emcid_to_cross_attn(
        comps, REQS, hp, latents_mean=mean, latents_logvar=logvar,
        captions=captions, cache_name=cache, verbose=False)
    import glob

    assert glob.glob(cache + "source_cat.npz")
    # cache-hit path (no latents needed)
    deltas2, edited2 = apply_emcid_to_cross_attn(
        comps, REQS, hp, captions=captions, cache_name=cache, verbose=False)
    for k in deltas:
        np.testing.assert_allclose(deltas[k][1], deltas2[k][1], atol=1e-5)
