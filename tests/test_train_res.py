"""Training-resolution lever (5th guarded deviation, built round 4).

``train_res`` / ``EMCID_TPU_TRAIN_RES`` lowers the training-image
resolution below the pipeline's native size; Stage-1 then optimizes at the
smaller latent grid.  The reference protocol trains at the pipe's native
resolution (compute_z.py:384-418 generates with the pipe defaults — 512
for SD-v1.4).  FLOPs scale quadratically with resolution (attention
super-quadratically), so 384 vs 512 is ≈0.56x the gen+Stage-1 cost — the
largest single lever in the protocol.

PRODUCT DEFAULT (flipped round 4 after scripts/prof_trainres.py measured
on-chip z-agreement cos 0.990 > the 0.942 seed-noise floor, PERF.md):
384 at the measured native-512 shape only; every other native size (tiny
test pipelines, SDXL-1024) keeps the reference resolution, so tiny runs
stay bitwise reference-exact.

Metric-level bounding lives in test_deviation_guards.py
(test_train_res_metric_parity, slow tier); this file guards the wiring:
the default gate, env/kwarg precedence, reference restore, and the
VAE-divisibility check.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from emcid_tpu.engine.editor import compute_zs_for_requests, \
    resolve_train_res
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline

HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 2, "v_lr": 0.1,
    "v_weight_decay": 5e-4, "mom2_adjustment": True,
    "mom2_update_weight": 4000,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100,
    "mom2_dtype": "float32", "objective": "ablate-dest", "esd_mu": "None",
}

REQ = {"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
       "seed_train": 3}


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog"])


def _zs(comps, **kw):
    hp = EMCIDHyperParams.from_dict(HP)
    return compute_zs_for_requests(
        comps, [dict(REQ)], hp, num_inference_steps=2, verbose=False, **kw)


def _fake_comps(sample_size, vae_scale, n_blocks=4):
    return SimpleNamespace(
        vae_scale=vae_scale,
        unet=SimpleNamespace(config=SimpleNamespace(
            sample_size=sample_size,
            block_out_channels=[32] * n_blocks)))


def test_default_gate(monkeypatch):
    """Product default 384 engages ONLY at the measured native-512 shape;
    env 0 restores the reference; env/kwarg precedence."""
    monkeypatch.delenv("EMCID_TPU_TRAIN_RES", raising=False)
    sd = _fake_comps(64, 8)          # SD-v1.x: native 512
    sdxl = _fake_comps(128, 8, 3)    # SDXL: native 1024
    tiny = _fake_comps(8, 2, 2)      # tiny test pipeline: native 16
    assert resolve_train_res(sd) == 384
    assert resolve_train_res(sdxl) == 1024   # unmeasured: reference
    assert resolve_train_res(tiny) == 16     # tiny runs reference-exact
    monkeypatch.setenv("EMCID_TPU_TRAIN_RES", "0")
    assert resolve_train_res(sd) == 512      # env 0 = reference restore
    monkeypatch.setenv("EMCID_TPU_TRAIN_RES", "448")
    assert resolve_train_res(sd) == 448      # env wins verbatim
    assert resolve_train_res(sd, 512) == 512  # kwarg beats env
    with pytest.raises(ValueError, match="divisible"):
        resolve_train_res(sd, 400)


@pytest.mark.slow
def test_default_is_reference(comps, monkeypatch):
    """Unset knob == explicit native resolution, bitwise (same program) —
    the 512 product gate does not engage at the tiny pipeline's native
    size."""
    monkeypatch.delenv("EMCID_TPU_TRAIN_RES", raising=False)
    native = comps.unet.config.sample_size * comps.vae_scale
    assert native != 512  # the gate must stay disengaged for this test
    ref = _zs(comps)
    explicit = _zs(comps, train_res=native)
    np.testing.assert_array_equal(ref, explicit)


@pytest.mark.slow
def test_env_drives_default_and_kwarg_wins(comps, monkeypatch):
    monkeypatch.delenv("EMCID_TPU_TRAIN_RES", raising=False)
    ref = _zs(comps)
    native = comps.unet.config.sample_size * comps.vae_scale

    monkeypatch.setenv("EMCID_TPU_TRAIN_RES", str(native // 2))
    low = _zs(comps)
    assert np.isfinite(low).all()
    assert low.shape == ref.shape  # z lives in text space: res-independent
    assert not np.array_equal(ref, low)

    # explicit kwarg beats the env (native restores the reference exactly)
    over = _zs(comps, train_res=native)
    np.testing.assert_array_equal(ref, over)


def test_res_must_divide_vae_scale(comps):
    with pytest.raises(ValueError, match="divisible"):
        _zs(comps, train_res=comps.vae_scale * 2 + 1)
