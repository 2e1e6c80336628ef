"""Experiments (sequential, ablation, finetune), plotting, workflow CLI."""

import json

import numpy as np
import pytest

import jax

from emcid_tpu.evals.plotting import (
    load_summary_records,
    parse_summary_key,
    plot_coco_preservation,
    plot_heatmap,
    plot_tradeoff_vs_edit_num,
    plot_tradeoff_vs_mom2,
)
from emcid_tpu.experiments.finetune import finetune_text_encoder
from emcid_tpu.experiments.sequential import sequential_editing
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline


def _hp(**over):
    d = {
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
    }
    d.update(over)
    return EMCIDHyperParams.from_dict(d)


def test_parse_summary_key():
    assert parse_summary_key("edit30_weight4000") == {
        "num_edit": 30, "mom2_weight": 4000.0, "edit_weight": 0.5}
    assert parse_summary_key("edit_30_weight4000_ew0.6")["edit_weight"] == 0.6
    with pytest.raises(ValueError):
        parse_summary_key("garbage")


def test_plotting_outputs(tmp_path):
    summary = {
        "edit5_weight4000": {"post_source_cls_score_edit": 0.4,
                             "post_cls_score_specificity": 0.8},
        "edit10_weight4000": {"post_source_cls_score_edit": 0.35,
                              "post_cls_score_specificity": 0.75},
        "edit10_weight8000": {"post_source_cls_score_edit": 0.5,
                              "post_cls_score_specificity": 0.85},
    }
    spath = tmp_path / "imgnet_aug_summary.json"
    spath.write_text(json.dumps(summary))
    rows = load_summary_records(spath)
    assert len(rows) == 3
    f1 = plot_tradeoff_vs_edit_num(spath, tmp_path / "p1.png", mom2_weight=4000)
    f2 = plot_tradeoff_vs_mom2(spath, tmp_path / "p2.png", num_edit=10)
    coco = {"edit_5_weight4000": {"fid": 14.2, "clip_vit_large": 26.0,
                                  "lpips": 0.1}}
    cpath = tmp_path / "coco_summary.json"
    cpath.write_text(json.dumps(coco))
    f3 = plot_coco_preservation(cpath, tmp_path / "p3.png")
    f4 = plot_heatmap(np.random.rand(4, 3), ["a", "b", "c", "d"],
                      tmp_path / "p4.png", layers=[0, 1, 2])
    for f in (f1, f2, f3, f4):
        assert (tmp_path / f.name if not str(f).startswith(str(tmp_path))
                else f).exists()


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog", "bird"])


GEN = dict(num_inference_steps=2, height=16, width=16)


@pytest.mark.slow
def test_sequential_editing(comps, tmp_path):
    rounds = [
        [{"source": "cat", "dest": "dog",
          "prompts": ["a photo of {}"], "seed_train": 1}],
        [{"source": "cat", "dest": "bird",
          "prompts": ["a photo of {}"], "seed_train": 2}],
    ]
    history = sequential_editing(
        comps, rounds, _hp(), val_prompts=["a photo of cat"],
        save_dir=tmp_path / "seq", sample_num=2, gen_kwargs=GEN,
        apply_kwargs=dict(num_inference_steps=2, stats_dir=tmp_path),
        verbose=False,
    )
    assert len(history) == 3
    pngs = sorted(p.name for p in (tmp_path / "seq").glob("*.png"))
    assert any("pre-seed" in n for n in pngs)
    assert any("round0-seed" in n for n in pngs)
    assert any("round1-seed" in n for n in pngs)
    # weights actually evolved between rounds
    from emcid_tpu.models.naming import get_weight

    name = "text_model.encoder.layers.3.mlp.fc2"
    w0 = np.asarray(get_weight(history[0].text_params, name))
    w1 = np.asarray(get_weight(history[1].text_params, name))
    w2 = np.asarray(get_weight(history[2].text_params, name))
    assert not np.allclose(w0, w1) and not np.allclose(w1, w2)


@pytest.mark.slow
def test_finetune_baseline(comps, rng):
    hp = _hp(v_num_grad_steps=4)
    reqs = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
             "seed_train": 0}]
    mean = rng.randn(1, 1, 1, 8, 8, 4).astype(np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    edited, losses = finetune_text_encoder(
        comps, reqs, hp, mean, logvar, steps=4, lr=1e-3, verbose=False)
    assert len(losses) == 4 and all(np.isfinite(losses))
    from emcid_tpu.models.naming import get_weight

    for layer in hp.layers:
        name = hp.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params, name)),
            np.asarray(get_weight(comps.text_params, name)))


def test_workflows_cli_layer_stats(tmp_path):
    from emcid_tpu.cli.workflows import main

    main([
        "layer_stats", "--tiny", "--layers", "2-3", "--sample_size", "16",
        "--stats_dir", str(tmp_path),
        "--hparams_dir", "/root/reference/hparams",
    ])
    files = list(tmp_path.rglob("*.npz"))
    assert len(files) == 2


@pytest.mark.slow
def test_workflows_cli_aice_tiny(tmp_path, monkeypatch):
    """The AICE workflow runs end-to-end on the tiny pipeline with a
    synthetic data tree."""
    import json as _json

    data = tmp_path / "data" / "iceb_data"
    data.mkdir(parents=True)
    rows = []
    for idx in range(10):
        cls, cid, dest, did = (("cat", 0, "dog", 1) if idx < 5
                               else ("w3", 2, "w4", 3))
        rows.append({"class name": cls, "text prompt": f"an image of {{}} {idx}",
                     "random seed": 100 + idx, "idx": idx, "class id": cid,
                     "checked": True, "dest": dest, "dest id": did})
    (data / "imgnet_aug_edit.json").write_text(_json.dumps(rows))
    (data / "imgnet_aug_test.json").write_text(_json.dumps([
        {"class name": "w9", "text prompt": "a w9", "random seed": 5,
         "idx": 0, "class id": 5}]))
    (data / "vit_classifier_config.json").write_text(
        _json.dumps({"id2label": {"0": "cat", "2": "w3"}}))

    from emcid_tpu.cli.workflows import main

    main([
        "aice", "--tiny", "--edit_nums", "2",
        "--hparams_dir", "/root/reference/hparams",
        "--data_dir", str(tmp_path / "data"),
        "--cache_dir", str(tmp_path / "cache"),
        "--results_dir", str(tmp_path / "results"),
        "--stats_dir", str(tmp_path / "stats"),
    ])
    summaries = list((tmp_path / "results").rglob("imgnet_aug_summary.json"))
    assert len(summaries) == 1
    rec = _json.loads(summaries[0].read_text())
    key = next(iter(rec))
    assert rec[key]["edit_time_s"] > 0
