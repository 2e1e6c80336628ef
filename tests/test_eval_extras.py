"""LPIPS, COCO eval, artists eval, I2P eval harnesses."""

import csv
import json

import numpy as np
import pytest

import jax

from emcid_tpu.evals.artists_eval import eval_artists, generate_artist_images
from emcid_tpu.evals.coco_eval import (
    cal_clip_score_coco,
    cal_lpips_coco,
    coco_summary_key,
    generate_coco,
)
from emcid_tpu.evals.i2p_eval import (
    detect_nude_classes,
    generate_i2p_imgs,
    i2p_nudity_summary,
)
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.lpips import LPIPS, LPIPSScorer, lpips_from_torch


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog"])


@pytest.fixture(scope="module")
def lpips():
    return LPIPSScorer(seed=0, size=64)


GEN = dict(num_inference_steps=2, height=16, width=16)


def test_lpips_properties(lpips, rng):
    a = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    b = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    same = lpips.distance(a, a)
    diff = lpips.distance(a, b)
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    assert (diff > 0).all()
    # resize path: odd input size
    c = rng.randint(0, 255, (1, 50, 50, 3)).astype(np.uint8)
    assert np.isfinite(lpips.distance(c, c)).all()


def test_lpips_torch_conversion_shapes():
    torch = pytest.importorskip("torch")
    # build a synthetic torch-style state dict with alexnet layout
    conv_shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                   (256, 384, 3, 3), (256, 256, 3, 3)]
    idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, (shape, j) in enumerate(zip(conv_shapes, idx)):
        sd[f"net.features.{j}.weight"] = torch.randn(*shape)
        sd[f"net.features.{j}.bias"] = torch.randn(shape[0])
        sd[f"lin{i}.model.1.weight"] = torch.randn(1, shape[0], 1, 1)
    params = lpips_from_torch(sd)
    model = LPIPS()
    template = model.init_params(jax.random.PRNGKey(0), 64)
    # structures line up
    assert set(params["net"]) == set(template["net"])
    for i in range(5):
        assert params[f"lin{i}"]["kernel"].shape == np.asarray(
            template[f"lin{i}"]["kernel"]).shape
    # converted params run
    x = jax.numpy.zeros((1, 64, 64, 3))
    out = model.apply({"params": params}, x, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_coco_eval_flow(comps, lpips, tmp_path):
    rows = [
        {"case_number": i, "prompt": f"a cat {i}", "evaluation_seed": 100 + i,
         "coco_id": i, "source": "coco-30k"}
        for i in range(4)
    ]
    generate_coco(comps, rows, tmp_path / "orig", gen_kwargs=GEN, batch_size=2)
    assert len(list((tmp_path / "orig").glob("*.png"))) == 4
    # second call skips (no new files, no error)
    generate_coco(comps, rows, tmp_path / "orig", gen_kwargs=GEN)

    # "edited" generations: different seed stream
    rows2 = [dict(r, evaluation_seed=r["evaluation_seed"] + 7) for r in rows]
    generate_coco(comps, rows2, tmp_path / "edited", gen_kwargs=GEN)
    rec = cal_lpips_coco(lpips, rows, tmp_path / "edited", tmp_path / "orig",
                         batch_size=3)
    assert rec["n"] == 4 and rec["lpips"] > 0

    key = coco_summary_key(30, 4000)
    assert key == "edit_30_weight4000"
    assert coco_summary_key(30, 4000, 0.6) == "edit_30_weight4000_ew0.6"


@pytest.mark.slow
def test_coco_clip_score(comps, tmp_path, rng):
    import dataclasses

    from emcid_tpu.models.clip_text import CLIPTextEncoder
    from emcid_tpu.models.vision import (
        CLIPScorer, CLIPVisionEncoder, TINY_CLIP_VISION,
    )

    vision = CLIPVisionEncoder(TINY_CLIP_VISION)
    vp = vision.init_params(jax.random.PRNGKey(5))
    tc = dataclasses.replace(comps.text_encoder.config, projection_dim=16)
    text = CLIPTextEncoder(tc)
    tp = text.init_params(jax.random.PRNGKey(6), seq_len=32)
    scorer = CLIPScorer(text, tp, vision, vp, comps.tokenizer)

    rows = [{"case_number": i, "prompt": f"a cat {i}", "evaluation_seed": i,
             "coco_id": i, "source": "c"} for i in range(3)]
    generate_coco(comps, rows, tmp_path / "imgs", gen_kwargs=GEN)
    rec = cal_clip_score_coco(scorer, rows, tmp_path / "imgs", batch_size=2)
    assert rec["n"] == 3 and np.isfinite(rec["clip_vit_large"])


def test_artists_eval_flow(comps, lpips, tmp_path):
    rows = [
        {"case_number": 0, "prompt": "painting by cat", "evaluation_seed": 1,
         "artist": "cat", "type": "erased"},
        {"case_number": 1, "prompt": "art by dog", "evaluation_seed": 2,
         "artist": "dog", "type": "holdout"},
    ]
    generate_artist_images(comps, rows, tmp_path / "pre", gen_kwargs=GEN)
    # post: images from a different seed offset to simulate the edit
    rows_post = [dict(r, evaluation_seed=r["evaluation_seed"] + 5) for r in rows]
    generate_artist_images(comps, rows_post, tmp_path / "tmp_post",
                           gen_kwargs=GEN)
    # rename to match pre names
    for r, rp in zip(rows, rows_post):
        src = tmp_path / "tmp_post" / f"{rp['case_number']}_{rp['evaluation_seed']}.png"
        dst = tmp_path / "post" / f"{r['case_number']}_{r['evaluation_seed']}.png"
        dst.parent.mkdir(exist_ok=True)
        src.rename(dst)
    result = eval_artists(rows, tmp_path / "pre", tmp_path / "post",
                          lpips=lpips, out_json=tmp_path / "artists.json")
    assert result["erased"]["lpips"] > 0
    assert result["holdout"]["lpips"] > 0
    assert (tmp_path / "artists.json").exists()


def test_i2p_eval_flow(comps, tmp_path):
    rows = [
        {"case_number": i, "prompt": f"prompt {i}", "evaluation_seed": i,
         "evaluation_guidance": 7.0}
        for i in range(3)
    ]
    generate_i2p_imgs(comps, rows, tmp_path / "i2p", gen_kwargs=GEN,
                      batch_size=2)
    assert len(list((tmp_path / "i2p").glob("*.png"))) == 3
    # detections CSV seam
    with open(tmp_path / "det.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "labels"])
        w.writeheader()
        w.writerow({"image": "0.png", "labels": "BELLY_EXPOSED;FACE_FEMALE"})
        w.writerow({"image": "1.png", "labels": ""})
        w.writerow({"image": "2.png", "labels": "FEMALE_BREAST_EXPOSED"})
    dets = detect_nude_classes(tmp_path / "i2p", tmp_path / "det.csv")
    counts = i2p_nudity_summary(dets, out_json=tmp_path / "i2p_cnt.json")
    assert counts["total_nude_images"] == 2
    saved = json.load(open(tmp_path / "i2p_cnt.json"))
    assert "total_images" not in saved  # artifact = reference key set only
    assert saved["total"] == counts["total"]
    with pytest.raises(FileNotFoundError):
        detect_nude_classes(tmp_path / "i2p", tmp_path / "missing.csv")
