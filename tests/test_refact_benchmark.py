"""RoAD/TIMED harness on the tiny pipeline with a synthetic dataset."""

import csv
import json

import numpy as np
import pytest

import jax

from emcid_tpu.evals.refact_benchmark import emcid_test, eval_all
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.vision import (
    CLIPScorer,
    CLIPVisionEncoder,
    TINY_CLIP_VISION,
)


def _tiny_scorer(comps):
    import dataclasses

    from emcid_tpu.models.clip_text import CLIPTextEncoder

    vision = CLIPVisionEncoder(TINY_CLIP_VISION)
    vp = vision.init_params(jax.random.PRNGKey(5))
    # text tower with projection head matching the vision projection dim
    text_cfg = dataclasses.replace(
        comps.text_encoder.config, projection_dim=16
    )
    text = CLIPTextEncoder(text_cfg)
    tp = text.init_params(jax.random.PRNGKey(6), seq_len=32)
    return CLIPScorer(
        text_model=text, text_params=tp, vision_model=vision,
        vision_params=vp, tokenizer=comps.tokenizer,
    )


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    base = tmp_path_factory.mktemp("refact")
    data = base / "timed"
    data.mkdir()
    fieldnames = ["old", "new"]
    for i in range(1, 6):
        fieldnames += [f"positive{i}", f"gt{i}"]
    for i in range(1, 6):
        fieldnames += [f"negative{i}", f"gn{i}"]
    with open(data / "TIMED_test_set_filtered_SD14.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        row = {"old": "a cat", "new": "a dog"}
        for i in range(1, 6):
            row[f"positive{i}"] = f"cat photo {i}"
            row[f"gt{i}"] = f"dog photo {i}"
            row[f"negative{i}"] = f"bird photo {i}"
            row[f"gn{i}"] = f"dog bird {i}"
        w.writerow(row)
    comps = build_tiny_pipeline(words=["cat", "dog", "bird"])
    return base, comps


def _hp():
    return EMCIDHyperParams.from_dict({
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
    })


@pytest.mark.slow
def test_timed_end_to_end(world):
    from emcid_tpu.dsets import TIMEDRoadRequestDataset

    base, comps = world
    ds = TIMEDRoadRequestDataset("timed", data_dir=base)
    hp = _hp()
    gen_kwargs = dict(num_inference_steps=2, height=16, width=16)
    results_dir = str(base / "results")

    emcid_test(
        comps, ds.requests, hp, "tiny-hp", "timed",
        seed_num=1, results_dir=results_dir, gen_kwargs=gen_kwargs,
        apply_kwargs=dict(num_inference_steps=2), verbose=False,
    )
    # 11 images generated in the reference layout
    img_root = (base / "results" / "images" / "timed" / "tiny-hp_w100"
                / "emcid" / "source_a cat_dest_a dog")
    pngs = list(img_root.rglob("seed_0.png"))
    assert len(pngs) == 11

    scorer = _tiny_scorer(comps)
    f1 = eval_all(
        scorer, ds.requests, "timed", "tiny-hp", mom2_weight=100,
        num_seeds=1, results_dir=results_dir,
    )
    jpath = base / "results" / "emcid" / "tiny-hp" / "timed_results_emcid.json"
    rec = json.load(open(jpath))["weight100"]
    for field in ("efficacy", "generality", "generality_75", "generality_90",
                  "specificity", "f1_score"):
        assert field in rec and 0.0 <= rec[field] <= 1.0
    assert f1 == rec["f1_score"]
    csv_path = base / "results" / "emcid" / "tiny-hp" / "timed_results_emcid.csv"
    rows = list(csv.DictReader(open(csv_path)))
    assert rows[0]["old"] == "a cat" and rows[0]["new"] == "a dog"

    # oracle leg
    emcid_test(
        comps, ds.requests, hp, "tiny-hp", "timed", seed_num=1, oracle=True,
        results_dir=results_dir, gen_kwargs=gen_kwargs, verbose=False,
    )
    f1o = eval_all(
        scorer, ds.requests, "timed", "tiny-hp", mom2_weight=100,
        num_seeds=1, oracle=True, results_dir=results_dir,
    )
    assert (base / "results" / "emcid" / "tiny-hp"
            / "timed_results_oracle.json").exists()


def test_eval_all_missing_images_raises(world):
    base, comps = world
    from emcid_tpu.dsets import TIMEDRoadRequestDataset

    ds = TIMEDRoadRequestDataset("timed", data_dir=base)
    scorer = _tiny_scorer(comps)
    with pytest.raises(FileNotFoundError):
        eval_all(scorer, ds.requests, "timed", "no-such-hp", mom2_weight=1,
                 num_seeds=1, results_dir=str(base / "nores"))


def test_clip_joint_edit_loop(tmp_path):
    """apply/execute_emcid_clip (reference emcid_main.py:109-311): the
    contrastive CLIP edit changes only the target fc2 layers, caches z, and
    leaves the caller's params untouched."""
    import dataclasses

    import jax
    import numpy as np

    from emcid_tpu.engine.clip_edit import apply_emcid_to_clip
    from emcid_tpu.hparams import ContrastEMCIDHyperParams
    from emcid_tpu.models.loader import build_tiny_pipeline
    from emcid_tpu.models import CLIPTextEncoder
    from emcid_tpu.models.naming import get_weight

    comps = build_tiny_pipeline(words=["cat", "dog"])
    # CLIP tower with projection (the joint-edit target in the reference)
    cfg = dataclasses.replace(comps.text_encoder.config, projection_dim=16)
    text = CLIPTextEncoder(cfg)
    tp = text.init_params(jax.random.PRNGKey(7), seq_len=32)
    hp = ContrastEMCIDHyperParams.from_dict(dict(
        layers=[1, 2], clamp_norm_factor=1.5,
        fact_token="subject_last", v_num_grad_steps=3, v_lr=0.1,
        v_weight_decay=5e-4, mom2_adjustment=True, mom2_update_weight=100,
        rewrite_module_tmp="text_model.encoder.layers.{}.mlp.fc2",
        layer_module_tmp="text_model.encoder.layers.{}",
        mlp_module_tmp="text_model.encoder.layers.{}.mlp",
        attn_module_tmp="text_model.encoder.layers.{}.self_attn",
        ln_f_module="text_model.final_layer_norm",
        lm_head_module="text_projection",
        mom2_dataset="ccs_filtered", mom2_n_samples=64,
        mom2_dtype="float32", v_loss_layer=3, kl_factor=0.0625,
        use_negative_images=False, num_negative_images=0,
        objective="contrastive"))
    reqs = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
             "negative_prompts": ["a bird"], "seed_train": 0}]
    cache = str(tmp_path / "z_")
    new_tp, deltas = apply_emcid_to_clip(
        text, tp, comps.tokenizer, reqs, hp,
        stats_dir=tmp_path, cache_name=cache, verbose=False)
    edited_names = set(deltas)
    assert edited_names == {
        "text_model.encoder.layers.1.mlp.fc2.weight",
        "text_model.encoder.layers.2.mlp.fc2.weight"}
    for layer in (1, 2):
        name = f"text_model.encoder.layers.{layer}.mlp.fc2"
        assert not np.allclose(np.asarray(get_weight(new_tp, name)),
                               np.asarray(get_weight(tp, name)))
    # untouched layer + caller params intact
    name0 = "text_model.encoder.layers.0.mlp.fc2"
    np.testing.assert_array_equal(np.asarray(get_weight(new_tp, name0)),
                                  np.asarray(get_weight(tp, name0)))
    # z cache written and reused (second run loads, identical result)
    import glob
    assert glob.glob(str(tmp_path / "z_*.npz"))
    new_tp2, _ = apply_emcid_to_clip(
        text, tp, comps.tokenizer, reqs, hp,
        stats_dir=tmp_path, cache_name=cache, verbose=False)
    for layer in (1, 2):
        name = f"text_model.encoder.layers.{layer}.mlp.fc2"
        np.testing.assert_allclose(np.asarray(get_weight(new_tp2, name)),
                                   np.asarray(get_weight(new_tp, name)),
                                   rtol=1e-5, atol=1e-6)
