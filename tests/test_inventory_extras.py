"""Inventory completions: stats extras, UNet stats, folder sweeps, BLIP seam,
mixed safety harness."""

import json

import numpy as np
import pytest

from emcid_tpu.stats.extras import Bincount, History, Quantile, TopK


def test_quantile(rng):
    q = Quantile(r=256)
    data = rng.randn(5000, 3)
    for chunk in np.array_split(data, 10):
        q.add(chunk)
    est = q.quantiles([0.1, 0.5, 0.9])
    true = np.quantile(data, [0.1, 0.5, 0.9], axis=0).T
    np.testing.assert_allclose(est, true, atol=0.12)
    assert q.size() == 5000
    # state roundtrip
    q2 = Quantile(state=q.state_dict())
    np.testing.assert_allclose(q2.median(), q.median(), atol=1e-9)


def test_topk(rng):
    t = TopK(k=5)
    data = rng.randn(200, 4)
    for chunk in np.array_split(data, 4):
        t.add(chunk)
    vals, idxs = t.result()
    assert vals.shape == (4, 5)
    np.testing.assert_allclose(vals, np.sort(data.T, axis=1)[:, ::-1][:, :5],
                               atol=1e-9)
    # indexes point back to the right stream rows
    for d in range(4):
        np.testing.assert_allclose(data[idxs[d], d], vals[d], atol=1e-9)


def test_bincount():
    b = Bincount()
    b.add(np.array([0, 1, 1, 3]))
    b.add(np.array([1, 5]))
    bc = b.bincount()
    assert bc[1] == 3 and bc[5] == 1 and b.size() == 6


def test_history(rng):
    h = History()
    h.add(rng.randn(3, 2))
    h.add(rng.randn(2, 2))
    assert h.history().shape == (5, 2)


def test_image_item_codec(tmp_path):
    from emcid_tpu.evals.folder_sweep import ImageItem, cal_heatmap

    single = ImageItem(tmp_path / "cat_3_mlp_l5_restore_cat.png")
    assert single.class_name == "cat" and single.idx == 3
    assert single.kind == "mlp" and single.restore_type == "single"
    assert single.restore_layer == 5 and single.token_to_restore == "cat"
    window = ImageItem(tmp_path / "cat_3_attn_s2_w4_restore_cat.png")
    assert window.restore_type == "window"
    assert window.start_layer == 2 and window.restore_window == 4
    clean = ImageItem(tmp_path / "cat_0_x_clean.png")
    assert clean.is_clean and not clean.is_restore

    single.matching_score = 0.7
    heat = cal_heatmap([single], n_layers=8, tokens=["a", "cat"])
    assert heat[1, 5] == pytest.approx(0.7)
    assert np.isnan(heat[0, 0])


def test_folder_sweep_cls(tmp_path):
    from PIL import Image

    from emcid_tpu.evals.folder_sweep import extract_all_images_cls
    from emcid_tpu.evals.scorers import make_vit_scorer

    for name in ("cat_0_x_clean.png", "cat_1_x_corrupt.png",
                 "cat_2_mlp_l1_restore_cat.png"):
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(tmp_path / name)
    scorer = make_vit_scorer()
    items = extract_all_images_cls(
        tmp_path, scorer, class_id_fn=lambda item: 0,
        file_path=tmp_path / "items.json")
    assert len(items) == 3
    assert all(i.matching_score is not None for i in items)
    assert (tmp_path / "items.json").exists()


def test_blip_seam_random_init():
    torch = pytest.importorskip("torch")
    from emcid_tpu.evals.blip import BlipITMScorer, calculate_single_blip_score

    scorer = BlipITMScorer.random_init(image_size=32)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 32, 32, 3),
                                            dtype=np.uint8)
    probs = scorer.itm_score(imgs, ["a cat", "a dog"])
    assert probs.shape == (2,)
    assert ((probs >= 0) & (probs <= 1)).all()
    s = calculate_single_blip_score(scorer, imgs[0], "a cat")
    assert 0 <= s <= 1


@pytest.mark.slow
def test_unet_layer_stats(rng):
    import jax

    from emcid_tpu.engine.unet_stats import layer_stats_unet
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(words=["cat"])
    pairs = [
        (rng.rand(16, 16, 3).astype(np.float32) * 2 - 1, "a photo of a cat"),
        (rng.rand(16, 16, 3).astype(np.float32) * 2 - 1, "cat cat"),
    ]
    stat = layer_stats_unet(
        comps,
        "up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_out.0",
        "attn-out", pairs, stats_dir="/tmp/unet_stats_test",
        t_steps_per_pair=2, sample_pair_size=2, force_recompute=True,
    )
    C = np.asarray(stat.mom2.moment())
    assert C.shape == (32, 32)
    assert np.isfinite(C).all()
    # symmetric PSD-ish
    np.testing.assert_allclose(C, C.T, atol=1e-4)


@pytest.mark.slow
def test_mixed_safety_harness(tmp_path):
    from emcid_tpu.evals.mixed_safety import emcid_test_sd_imgnet_and_i2p
    from emcid_tpu.evals.scorers import make_vit_scorer
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models.loader import build_tiny_pipeline

    data = tmp_path / "iceb_data"
    data.mkdir()
    rows = [
        {"class name": "cat", "text prompt": f"an image of {{}} {i}",
         "random seed": 100 + i, "idx": i, "class id": 0, "checked": True,
         "dest": "dog", "dest id": 1}
        for i in range(5)
    ]
    (data / "imgnet_aug_edit.json").write_text(json.dumps(rows))
    (data / "imgnet_aug_test.json").write_text(json.dumps([
        {"class name": "w9", "text prompt": "a w9", "random seed": 5,
         "idx": 0, "class id": 5}]))
    (data / "vit_classifier_config.json").write_text(
        json.dumps({"id2label": {"0": "cat"}}))

    comps = build_tiny_pipeline(words=["cat", "dog", "nudity", "w9"])
    hp = EMCIDHyperParams.from_dict({
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
        "esd_mu": "None", "add_uce_edit": True,
    })
    i2p_rows = [{"case_number": 0, "prompt": "unsafe thing",
                 "evaluation_seed": 1, "evaluation_guidance": 7.0}]
    rec = emcid_test_sd_imgnet_and_i2p(
        comps, make_vit_scorer(), hp, "tiny-hp", num_edit=1,
        data_dir=tmp_path, cache_dir=tmp_path / "cache",
        results_dir=tmp_path / "results",
        gen_kwargs=dict(num_inference_steps=2, height=16, width=16),
        apply_kwargs=dict(num_inference_steps=2, stats_dir=tmp_path / "st"),
        uce_kwargs=dict(lamb=0.5, erase_scale=0.5, technique="replace"),
        i2p_rows=i2p_rows, i2p_out_dir=tmp_path / "i2p",
    )
    assert np.isfinite(rec["post_source_cls_score_edit"])
    assert (tmp_path / "i2p" / "0.png").exists()
    assert (tmp_path / "results" / "emcid" / "tiny-hp"
            / "imgnet_aug_i2p_summary.json").exists()
