"""Eval layer: ViT scorer math, summary codec/idempotence, FID math,
and the full AICE harness on the tiny pipeline with a synthetic ICEB tree."""

import json

import numpy as np
import pytest

import jax

from emcid_tpu.evals.scorers import (
    ViTScorer,
    cal_nudity_rate,
    calculate_single_cls_score,
    cls_scores_batched,
    fid_from_features,
    frechet_distance,
    make_vit_scorer,
)
from emcid_tpu.evals.summary import (
    lookup_summary,
    summary_key,
    update_summary,
)


def test_summary_key_codec():
    assert summary_key(30, 4000) == "edit30_weight4000"
    assert summary_key(30, 4000, 0.5) == "edit30_weight4000"
    assert summary_key(30, 4000, 0.6) == "edit30_weight4000_ew0.6"
    assert summary_key(1, 4000, prefix="edit_") == "edit_1_weight4000"


def test_update_summary_merge_and_idempotence(tmp_path):
    p = tmp_path / "s.json"
    update_summary(p, "edit5_weight4000", {"pre_a": 1.0})
    update_summary(p, "edit5_weight4000", {"post_a": 2.0})
    rec = lookup_summary(p, "edit5_weight4000")
    assert rec == {"pre_a": 1.0, "post_a": 2.0}
    assert lookup_summary(p, "edit7_weight4000") is None
    # valid json on disk
    assert "edit5_weight4000" in json.load(open(p))


def test_vit_scorer_probs(rng):
    scorer = make_vit_scorer()
    imgs = rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    probs = scorer.probs(imgs)
    # smoke scorer: tiny tower with an ImageNet-shaped (1000-class) head
    assert probs.shape == (4, 1000)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    s = calculate_single_cls_score(scorer, imgs, 3)
    np.testing.assert_allclose(s, probs[:, 3].mean(), rtol=1e-6)
    m, st = calculate_single_cls_score(scorer, imgs, 3, return_std=True)
    assert st >= 0


def test_cls_scores_batched_grouping(rng):
    scorer = make_vit_scorer()
    imgs = rng.randint(0, 255, (6, 32, 32, 3)).astype(np.uint8)
    grouped = cls_scores_batched(scorer, imgs, [1, 2], [3, 3])
    manual1 = calculate_single_cls_score(scorer, imgs[:3], 1)
    manual2 = calculate_single_cls_score(scorer, imgs[3:], 2)
    np.testing.assert_allclose(grouped, [manual1, manual2], rtol=1e-5)


def test_frechet_distance_properties(rng):
    f1 = rng.randn(500, 8)
    f2 = rng.randn(500, 8) + 2.0
    same = fid_from_features(f1, f1)
    diff = fid_from_features(f1, f2)
    assert same < 1e-6
    assert diff > 1.0
    # identical Gaussians analytically
    mu, sig = np.zeros(4), np.eye(4)
    assert frechet_distance(mu, sig, mu, sig) < 1e-9
    # known closed form: same cov, shifted mean → ||dmu||^2
    mu2 = np.ones(4) * 2
    np.testing.assert_allclose(frechet_distance(mu, sig, mu2, sig), 16.0,
                               atol=1e-6)


def test_nudity_rate():
    dets = [["BELLY_EXPOSED", "FACE_FEMALE"], [],
            ["FEMALE_BREAST_EXPOSED", "BELLY_EXPOSED"]]
    counts = cal_nudity_rate(dets)
    assert counts["BELLY_EXPOSED"] == 2
    # reference quirk (eval_i2p_nudity.py:103-113): substring match against
    # the joined label string, so MALE_BREAST_EXPOSED fires on FEMALE_*
    assert counts["MALE_BREAST_EXPOSED"] == 1
    assert counts["total"] == 4  # reference key: sum over label counts
    assert counts["total_nude_images"] == 2
    assert counts["total_images"] == 3


def test_nudity_rate_once_per_image():
    # duplicate labels in one image count once (reference iterates labels,
    # not detections, per row)
    counts = cal_nudity_rate([["ANUS_EXPOSED", "ANUS_EXPOSED"]])
    assert counts["ANUS_EXPOSED"] == 1 and counts["total"] == 1


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    """Tiny pipeline + synthetic ICEB data tree + tiny ViT scorer."""
    from emcid_tpu.models.loader import build_tiny_pipeline

    base = tmp_path_factory.mktemp("world")
    data = base / "data" / "iceb_data"
    data.mkdir(parents=True)
    rows = []
    idx = 0
    for cls, cid, dest, did in [("cat", 0, "dog", 1), ("w3", 2, "w4", 3)]:
        for _ in range(5):
            rows.append({
                "class name": cls, "text prompt": f"an image of a {{}} v{idx}",
                "random seed": 100 + idx, "idx": idx, "class id": cid,
                "checked": True, "dest": dest, "dest id": did,
            })
            idx += 1
    with open(data / "imgnet_aug_edit.json", "w") as f:
        json.dump(rows, f)
    test_rows = [
        {"class name": "w9", "text prompt": f"a photo of w9 n{i}",
         "random seed": 55 + i, "idx": i, "class id": 5}
        for i in range(3)
    ]
    with open(data / "imgnet_aug_test.json", "w") as f:
        json.dump(test_rows, f)
    with open(data / "vit_classifier_config.json", "w") as f:
        json.dump({"id2label": {"0": "cat, kitty", "2": "w3"}}, f)
    comps = build_tiny_pipeline(words=["cat", "dog", "kitty", "w9"])
    scorer = make_vit_scorer()
    return comps, scorer, base / "data", base


def _tiny_hp(layers=(2, 3)):
    from emcid_tpu.hparams import EMCIDHyperParams

    return EMCIDHyperParams.from_dict({
        "layers": list(layers), "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": 4, "v_lr": 0.1, "v_weight_decay": 5e-4,
        "mom2_adjustment": True, "mom2_update_weight": 100,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 50,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None",
    })


@pytest.mark.slow
def test_full_aice_harness_tiny(tiny_world):
    comps, scorer, data_dir, base = tiny_world
    hp = _tiny_hp()
    gen_kwargs = dict(num_inference_steps=2, height=16, width=16)
    record = None
    import emcid_tpu.evals.iceb as iceb_mod

    record = iceb_mod.emcid_test_text_encoder_imgnet(
        comps, scorer, hp, "tiny-hp", num_edit=2,
        dataset_name="imgnet_aug", data_dir=data_dir,
        cache_dir=base / "cache", results_dir=base / "results",
        gen_kwargs=gen_kwargs, batch_size=8,
        apply_kwargs=dict(num_inference_steps=2),
    )
    # all 20 pre/post fields present and finite
    for p in ("pre", "post"):
        for field in ("source_cls_score_edit", "dest_cls_score_edit",
                      "source_dest_cls_score_edit", "cls_score_specificity",
                      "source_cls_score_general", "dest_cls_score_general",
                      "source_dest_cls_score_general"):
            v = record[f"{p}_{field}"]
            assert v is not None and np.isfinite(v), (p, field, v)
    assert record["edit_time_s"] > 0
    # summary written with the right key; second call is idempotent
    spath = base / "results" / "emcid" / "tiny-hp" / "imgnet_aug_summary.json"
    assert spath.exists()
    again = iceb_mod.emcid_test_text_encoder_imgnet(
        comps, scorer, hp, "tiny-hp", num_edit=2,
        dataset_name="imgnet_aug", data_dir=data_dir,
        cache_dir=base / "cache", results_dir=base / "results",
        gen_kwargs=gen_kwargs,
    )
    assert again == record
    # pre-edit image cache populated with the reference naming
    cache_imgs = list((base / "cache" / "images" / "imgnet_aug").glob("*.png"))
    assert any(n.name.startswith("train_cat_pre_") for n in cache_imgs)
