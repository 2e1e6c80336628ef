"""Rectification harness on the tiny pipeline (EMCID + UCE baseline)."""

import json

import numpy as np
import pytest

from emcid_tpu.evals.rectification import emcid_test_imgnet_mend
from emcid_tpu.evals.scorers import make_vit_scorer
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    base = tmp_path_factory.mktemp("mend")
    data = base / "iceb_data"
    data.mkdir(parents=True)
    # class 0: 'cat' scores well, 'kitty' scores badly -> mend kitty -> cat
    summary = {
        "0": {"cat": {"mean": 0.8, "std": 0.1, "number": 8},
              "kitty": {"mean": 0.05, "std": 0.01, "number": 8}},
    }
    (data / "imgnet_prompts_cls.json").write_text(json.dumps(summary))
    rows = [
        {"class name": "cat", "text prompt": f"an image of cat {i}",
         "random seed": 100 + i, "idx": i, "class id": 0}
        for i in range(3)
    ]
    (data / "imgnet_aug_full.json").write_text(json.dumps(rows))
    (data / "imgnet_aug_test.json").write_text(json.dumps([
        {"class name": "w9", "text prompt": "a w9", "random seed": 5,
         "idx": 0, "class id": 5}]))
    comps = build_tiny_pipeline(words=["cat", "kitty", "w9"])
    return base, comps, make_vit_scorer()


def _hp():
    return EMCIDHyperParams.from_dict({
        "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
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
    })


GEN = dict(num_inference_steps=2, height=16, width=16)


@pytest.mark.slow
def test_mend_emcid(world):
    base, comps, scorer = world
    rec = emcid_test_imgnet_mend(
        comps, scorer, _hp(), "tiny-hp", num_edit=1,
        data_dir=base, cache_dir=base / "cache",
        results_dir=base / "results", gen_kwargs=GEN,
        apply_kwargs=dict(num_inference_steps=2, stats_dir=base / "stats"),
    )
    for f in ("pre_source_score_edit", "post_source_score_edit",
              "pre_dest_score_edit", "post_dest_score_edit",
              "pre_cls_score_specificity", "post_cls_score_specificity"):
        assert rec[f] is not None and np.isfinite(rec[f])
    spath = base / "results" / "emcid" / "tiny-hp" / "imgnet_mend_summary.json"
    assert spath.exists()
    key = next(iter(json.loads(spath.read_text())))
    assert key == "edit1_weight100"
    # idempotent
    again = emcid_test_imgnet_mend(
        comps, scorer, _hp(), "tiny-hp", num_edit=1,
        data_dir=base, results_dir=base / "results", gen_kwargs=GEN,
    )
    assert again == rec


@pytest.mark.slow
def test_mend_uce_baseline(world):
    base, comps, scorer = world
    rec = emcid_test_imgnet_mend(
        comps, scorer, _hp(), "tiny-hp", num_edit=1, method="uce",
        data_dir=base, cache_dir=base / "cache2",
        results_dir=base / "results", gen_kwargs=GEN,
        uce_kwargs=dict(lamb=0.5, erase_scale=0.5, technique="replace"),
    )
    assert np.isfinite(rec["post_source_score_edit"])
    spath = base / "results" / "baselines" / "uce" / "imgnet_mend_summary.json"
    assert spath.exists()
    assert "edit1" in json.loads(spath.read_text())
