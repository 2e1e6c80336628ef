"""Mechanics of the one-command real-weight lever certification
(evals/lever_cert.py; VERDICT r4 next #2).  The tiny run certifies the
HARNESS, not the levers: structure, pre-registered rule wiring, JSON
artifact, and the RESTORE path (every lever has a recipe)."""

import json

import numpy as np
import pytest

from emcid_tpu.evals.lever_cert import (
    RESTORE_RECIPES,
    agreement,
    certify_levers,
    default_requests,
    lever_specs,
)
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline

TINY_HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 4, "v_lr": 0.1,
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


def test_agreement_math():
    a = np.array([[1.0, 0.0], [0.0, 2.0]])
    cos, ratio = agreement(a, a * 3.0)
    np.testing.assert_allclose(cos, 1.0, atol=1e-12)
    np.testing.assert_allclose(ratio, 3.0, atol=1e-12)
    cos, _ = agreement(a, np.array([[0.0, 1.0], [2.0, 0.0]]))
    np.testing.assert_allclose(cos, 0.0, atol=1e-12)


def test_every_lever_has_restore_recipe():
    comps = build_tiny_pipeline(seed=0)
    assert set(lever_specs(comps)) == set(RESTORE_RECIPES)


@pytest.mark.slow
def test_certify_levers_tiny(tmp_path):
    comps = build_tiny_pipeline(seed=0)
    hp = EMCIDHyperParams.from_dict(TINY_HP)
    reqs = [
        {"prompts": ["a photo of {}", "{}"], "source": s, "dest": d,
         "seed_train": i}
        for i, (s, d) in enumerate([("cat", "dog"), ("w0", "w1")])
    ]
    out = tmp_path / "lever_cert.json"
    res = certify_levers(comps, hp, requests=reqs, num_inference_steps=2,
                         verbose=False, out_path=str(out))
    assert set(res) == {"_floor", "compound"} | set(RESTORE_RECIPES)
    floor = res["_floor"]
    assert floor["cos_bar"] <= floor["cos_mean"]
    for lever, row in res.items():
        if lever.startswith("_"):
            continue
        assert isinstance(row["keep"], bool)
        assert row["rule"] in ("z-agreement", "loss-parity",
                               "z-agreement-or-loss+guards")
        assert -1.0 <= row["cos_mean"] <= 1.0 + 1e-9
    assert res["compound"]["rule"] == "z-agreement-or-loss+guards"
    # artifact round-trips
    loaded = json.loads(out.read_text())
    assert loaded["_floor"]["floor_sigmas"] == 2.0
    # real words → default_requests shape contract
    assert all({"prompts", "source", "dest",
                "seed_train"} <= set(r) for r in default_requests(3))
