"""Stage-1 lr-schedule seam (ZOptimizer.lr_sched).

The lr now enters the compiled step program as per-step scan data (one
program serves every schedule — a compile-time lr constant would cost a
fresh multi-minute remote compile per schedule on the tunneled TPU).
"const" must reproduce the reference protocol exactly; "cosine" is the
guarded fast protocol (z_frac * steps at a cosine-decayed lr peaking at
z_peak * v_lr) and must reach the same loss regime and edit metrics."""

import dataclasses

import jax
import numpy as np
import pytest

from emcid_tpu.engine.compute_z import (
    ConceptBatch, ZOptimizer, prepare_concept_batch,
)
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline

HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 50, "v_lr": 0.1,
    "v_weight_decay": 5e-4, "mom2_adjustment": True,
    "mom2_update_weight": 4000,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100,
    "mom2_dtype": "float32", "objective": "ablate-dest", "esd_mu": "None",
    "cal_text_repr_loss": True, "text_repr_loss_scale_factor": 0.01,
}


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog"])


def _batch(comps, hp, seed=0):
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "cat",
             "dest": "dog", "seed_train": 1}]
    arrays, _, _ = prepare_concept_batch(comps.tokenizer, reqs, hp)
    rng = np.random.RandomState(seed)
    h = comps.unet.config.sample_size
    arrays["latents_mean"] = rng.randn(1, 2, 2, h, h, 4).astype(
        np.float32) * 0.2
    arrays["latents_logvar"] = np.full((1, 2, 2, h, h, 4), -6.0, np.float32)
    import jax.numpy as jnp

    return ConceptBatch(**{k: jnp.asarray(arrays[k])
                           for k in ConceptBatch._fields})


def _run(comps, hp, seed=0, **opt_over):
    optz = ZOptimizer(comps.text_encoder, comps.unet, comps.schedule,
                      hp, layer=hp.layers[-1], eps_pool=0, **opt_over)
    zs, delta, z0, losses = optz.run(
        comps.text_params, comps.unet_params, _batch(comps, hp),
        jax.random.PRNGKey(seed))
    return np.asarray(zs), np.asarray(delta), np.asarray(losses)


@pytest.mark.slow
def test_const_schedule_is_deterministic_reference_path(comps):
    """lr-as-data with a constant array must be a pure refactor: two runs
    identical, loss decreasing, and the step count exactly
    v_num_grad_steps."""
    hp = EMCIDHyperParams.from_dict(dict(HP, v_num_grad_steps=12))
    zs1, d1, l1 = _run(comps, hp, seed=3)
    zs2, d2, l2 = _run(comps, hp, seed=3)
    np.testing.assert_array_equal(zs1, zs2)
    assert l1.shape == (12,)
    assert l1[-4:].mean() < l1[:4].mean()


@pytest.mark.slow
def test_cosine_runs_fewer_steps_same_regime(comps):
    hp = EMCIDHyperParams.from_dict(HP)  # 50 steps -> engages
    zs_c, d_c, l_c = _run(comps, hp, lr_sched="cosine", z_frac=0.6,
                          z_peak=2.0)
    zs_k, d_k, l_k = _run(comps, hp)  # const 50
    assert l_c.shape == (30,) and l_k.shape == (50,)
    # same loss regime in 60% of the steps
    assert l_c[-5:].mean() < 2.0 * max(l_k[-5:].mean(), 1e-6), (
        f"cosine-30 final {l_c[-5:].mean():.5f} vs const-50 "
        f"{l_k[-5:].mean():.5f}")
    # and the z direction agrees
    cf, cp = d_k.ravel(), d_c.ravel()
    cos = float(cf @ cp / (np.linalg.norm(cf) * np.linalg.norm(cp) + 1e-9))
    assert cos > 0.7, f"cosine z diverges from const (cos={cos:.3f})"


@pytest.mark.slow
def test_cosine_leaves_small_runs_alone(comps):
    """Tiny smoke runs (< 50 steps) must stay reference-exact even with
    the cosine schedule selected."""
    hp = EMCIDHyperParams.from_dict(dict(HP, v_num_grad_steps=8))
    zs_c, _, l_c = _run(comps, hp, seed=5, lr_sched="cosine")
    zs_k, _, l_k = _run(comps, hp, seed=5)
    np.testing.assert_array_equal(zs_c, zs_k)
    assert l_c.shape == (8,)


@pytest.mark.slow
def test_cosine_ignores_replay_override(comps):
    """The record/replay seam (RNG parity with the reference) bypasses the
    schedule: overrides force the const path."""
    import jax.numpy as jnp

    hp = EMCIDHyperParams.from_dict(HP)
    batch = _batch(comps, hp)
    h = comps.unet.config.sample_size
    noise = jnp.asarray(
        np.random.RandomState(0).randn(50, 1, 2, h, h, 4), jnp.float32)
    ts = jnp.asarray(np.full((50, 1, 2), 5), jnp.int32)
    outs = {}
    for tag, sched in (("cosine", "cosine"), ("const", "const")):
        optz = ZOptimizer(comps.text_encoder, comps.unet, comps.schedule,
                          hp, layer=hp.layers[-1], eps_pool=0,
                          lr_sched=sched)
        zs, *_ = optz.run(comps.text_params, comps.unet_params, batch,
                          jax.random.PRNGKey(0),
                          noise_override=noise, ts_override=ts)
        outs[tag] = np.asarray(zs)
    np.testing.assert_allclose(outs["cosine"], outs["const"], rtol=1e-5)


@pytest.mark.slow
def test_cosine_metric_parity(comps, tmp_path):
    """Tiny-AICE weight-update parity for the fast protocol, same guard
    shape as the eps_pool/dpm++ levers."""
    from emcid_tpu.engine.editor import apply_emcid
    from emcid_tpu.models.naming import get_weight

    hp = EMCIDHyperParams.from_dict(HP)
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "cat",
             "dest": "dog", "seed_train": 1}]
    outs = {}
    for tag, env in (("const", "const"), ("cosine", "cosine")):
        import os

        os.environ["EMCID_TPU_Z_SCHED"] = env
        try:
            edited, _ = apply_emcid(
                comps, reqs, hp, stats_dir=tmp_path / "stats",
                num_inference_steps=2, eps_dest_pool=0, verbose=False)
        finally:
            os.environ.pop("EMCID_TPU_Z_SCHED", None)
        name = hp.rewrite_module_tmp.format(hp.layers[-1])
        outs[tag] = (np.asarray(get_weight(edited.text_params, name))
                     - np.asarray(get_weight(comps.text_params, name)))
    u_f, u_p = outs["const"].ravel(), outs["cosine"].ravel()
    cos = float(u_f @ u_p / (np.linalg.norm(u_f) * np.linalg.norm(u_p)
                             + 1e-9))
    assert cos > 0.7, f"weight-update direction diverged (cos={cos:.3f})"
    ratio = np.linalg.norm(u_p) / max(np.linalg.norm(u_f), 1e-9)
    assert 0.5 < ratio < 2.0, f"edit magnitude diverged (ratio={ratio:.3f})"
