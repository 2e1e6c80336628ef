"""Training-resolution lever (5th guarded deviation, OPT-IN, built round 4).

``train_res`` / ``EMCID_TPU_TRAIN_RES`` lowers the training-image
resolution below the pipeline's native size; Stage-1 then optimizes at the
smaller latent grid.  The reference protocol trains at the pipe's native
resolution (compute_z.py:384-418 generates with the pipe defaults — 512
for SD-v1.4), so the default (unset/0) must be reference-exact.  FLOPs
scale quadratically with resolution (attention super-quadratically), so
384 vs 512 is ≈0.56x the gen+Stage-1 cost — the largest single lever in
the protocol; it stays opt-in until scripts/prof_trainres.py measures
z-agreement at SD shapes on-chip.

Metric-level bounding lives in test_deviation_guards.py
(test_train_res_metric_parity, slow tier); this file guards the wiring:
default == reference, env drives the default, kwarg beats env, and the
VAE-divisibility check.
"""

import numpy as np
import pytest

from emcid_tpu.engine.editor import compute_zs_for_requests
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


def test_default_is_reference(comps, monkeypatch):
    """Unset knob == explicit native resolution, bitwise (same program)."""
    monkeypatch.delenv("EMCID_TPU_TRAIN_RES", raising=False)
    native = comps.unet.config.sample_size * comps.vae_scale
    ref = _zs(comps)
    explicit = _zs(comps, train_res=native)
    np.testing.assert_array_equal(ref, explicit)


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
