"""Figure surface: artists/COCO/debias/ablation plotters (synthetic
summaries) + visual-example CLI modes on the tiny pipeline."""

import csv
import json

import numpy as np
import pytest

from emcid_tpu.evals.plotting import (
    ablation_metrics,
    load_artists_summary,
    plot_ablation_curves,
    plot_artists_lpips_clip,
    plot_coco_multi,
    plot_debias_ratios,
    plot_layer_ablation,
)


def _artists_summary(scale=1.0):
    out = {}
    for n in (1, 5, 10):
        out[f"edit_{n}_weight4000"] = {
            "edit_lpips": {"mean": 0.1 * n * scale, "std": 0.02},
            "hold_out_lpips": {"mean": 0.02 * n * scale, "std": 0.01},
            "edit_clip": {"mean": 30 - n * scale, "std": 1.0},
            "hold_out_clip": {"mean": 29.5, "std": 1.1},
        }
    out["sd_orig_100"] = {"edit_clip": {"mean": 31.0, "std": 0.9}}
    return out


def test_load_artists_summary(tmp_path):
    p = tmp_path / "artists_summary.json"
    p.write_text(json.dumps(_artists_summary()))
    rows, orig = load_artists_summary(p, max_x=5)
    assert [r["num_edit"] for r in rows] == [1, 5]
    assert orig["edit_clip"]["mean"] == 31.0


def test_plot_artists_lpips_clip(tmp_path):
    paths = {}
    for name, scale in (("emcid", 1.0), ("uce", 1.4)):
        p = tmp_path / f"{name}_artists_summary.json"
        p.write_text(json.dumps(_artists_summary(scale)))
        paths[name] = p
    out = plot_artists_lpips_clip(
        paths, tmp_path / "artists.png",
        orig_summary_path=paths["emcid"])
    assert out.exists() if hasattr(out, "exists") else \
        (tmp_path / "artists.png").exists()


def test_plot_coco_multi(tmp_path):
    paths = {}
    for name in ("emcid", "uce-no_prompts"):
        summary = {
            f"edit_{n}_weight4000": {
                "lpips": {"mean": 0.05 * n, "std": 0.01},
                "clip_vit_large": {"mean": 26.0 - 0.1 * n, "std": 1.0},
                "fid": 14.0 + 0.2 * n,
            } for n in (5, 50)
        }
        p = tmp_path / f"{name}_coco_summary.json"
        p.write_text(json.dumps(summary))
        paths[name] = p
    plot_coco_multi(paths, tmp_path / "coco_v.png", plot_lpips=True)
    plot_coco_multi(paths, tmp_path / "coco_h.png", direction="horizontal")
    assert (tmp_path / "coco_v.png").exists()
    assert (tmp_path / "coco_h.png").exists()
    # scalar records (our coco_eval writes floats for fid) also parse
    p = tmp_path / "scalar_coco_summary.json"
    p.write_text(json.dumps({"edit_5_weight4000": {
        "lpips": 0.1, "clip_vit_large": 26.0, "fid": 14.0}}))
    plot_coco_multi({"s": p}, tmp_path / "coco_s.png", plot_lpips=True)
    assert (tmp_path / "coco_s.png").exists()


def _aice_record(s2d_post=0.5, spec_post=0.8):
    return {
        "pre_source_dest_cls_score_general": 0.1,
        "post_source_dest_cls_score_general": s2d_post,
        "pre_cls_score_specificity": 0.9,
        "post_cls_score_specificity": spec_post,
        "pre_source_dest_cls_score_alias": 0.2,
        "post_source_dest_cls_score_alias": 0.4,
    }


def test_ablation_metrics():
    m = ablation_metrics(_aice_record())
    assert m["general_source2dest"] == pytest.approx(0.4)
    assert m["holdout_delta"] == pytest.approx(-0.1)
    assert m["average_score"] == pytest.approx(0.15)
    assert m["alias2dest"] == pytest.approx(0.2)


def test_plot_ablation_curves(tmp_path):
    points = {w: _aice_record(s2d_post=0.3 + w / 2)
              for w in (0.3, 0.5, 0.7)}
    plot_ablation_curves(points, tmp_path / "ew.png", xlabel="edit_weight")
    assert (tmp_path / "ew.png").exists()
    points = {t: _aice_record(spec_post=0.9 - 0.05 * t) for t in (1, 2, 3)}
    plot_ablation_curves(points, tmp_path / "tok.png",
                         xlabel="num_edit_tokens")
    assert (tmp_path / "tok.png").exists()


def test_plot_layer_ablation(tmp_path):
    cells = {(s, e): _aice_record(s2d_post=0.2 + 0.05 * (e - s))
             for e in (9, 10, 11) for s in range(7, e + 1)}
    plot_layer_ablation(cells, tmp_path / "layers.png")
    assert (tmp_path / "layers.png").exists()


def test_plot_debias_ratios(tmp_path):
    p = tmp_path / "ratios.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "female", "male", "delta", "delta_std"])
        w.writerow(["doctor", 0.4, 0.6, 0.2, 0.05])
        w.writerow(["nurse", 0.8, 0.2, 0.6, 0.1])
        w.writerow(["total", "", "", 0.4, 0.08])
    plot_debias_ratios(p, tmp_path / "debias.png")
    assert (tmp_path / "debias.png").exists()


def test_plots_cli(tmp_path):
    from emcid_tpu.cli.workflows import main

    a = tmp_path / "artists_summary.json"
    a.write_text(json.dumps(_artists_summary()))
    main(["plots", "--figure", "artists", "--summary", f"emcid={a}",
          "--out", str(tmp_path / "f1.png")])
    assert (tmp_path / "f1.png").exists()

    ew = {f"edit10_weight4000_ew{w}": _aice_record(s2d_post=0.3 + w / 2)
          for w in (0.3, 0.7)}
    ew["edit10_weight4000"] = _aice_record()  # ew defaults to 0.5
    s = tmp_path / "imgnet_aug_summary.json"
    s.write_text(json.dumps(ew))
    main(["plots", "--figure", "edit_weight_ablation", "--summary", str(s),
          "--num_edit", "10", "--out", str(tmp_path / "f2.png")])
    assert (tmp_path / "f2.png").exists()

    for tag, cell in (("ly7-9", (7, 9)), ("ly8-9", (8, 9)),
                      ("ly7-10", (7, 10))):
        d = tmp_path / "layer_ablation" / f"hp_{tag}"
        d.mkdir(parents=True)
        (d / "imgnet_aug_summary.json").write_text(
            json.dumps({"edit10_weight4000": _aice_record()}))
    main(["plots", "--figure", "layer_ablation",
          "--glob", str(tmp_path / "layer_ablation" / "*" /
                        "imgnet_aug_summary.json"),
          "--out", str(tmp_path / "f3.png")])
    assert (tmp_path / "f3.png").exists()

    for t in (1, 2):
        d = tmp_path / "tok_ablation" / f"hp_tok{t}"
        d.mkdir(parents=True)
        (d / "imgnet_aug_summary.json").write_text(
            json.dumps({"edit10_weight4000": _aice_record(0.3 + 0.1 * t)}))
    main(["plots", "--figure", "token_ablation",
          "--glob", str(tmp_path / "tok_ablation" / "*" /
                        "imgnet_aug_summary.json"),
          "--out", str(tmp_path / "f4.png")])
    assert (tmp_path / "f4.png").exists()


# ---------------------------------------------------------------------------
# visual-example CLI modes (tiny pipeline; reference visual_examples.py legs)
# ---------------------------------------------------------------------------

def _run(tmp_path, *argv):
    from emcid_tpu.cli.visual_examples import main

    return main([*argv, "--tiny", "--sample_num", "2",
                 "--out_dir", str(tmp_path),
                 "--hparams_dir", "/root/reference/hparams"])


@pytest.mark.slow
def test_visual_single_custom(tmp_path):
    out = _run(tmp_path, "--source", "cat", "--dest", "dog",
               "--val_prompt", "a photo of cat")
    assert (out / "pre_post.png").exists()


@pytest.mark.slow
def test_visual_single_named_uk(tmp_path):
    out = _run(tmp_path, "--example", "uk")
    assert (out / "pre_post.png").exists()


@pytest.mark.slow
def test_visual_artists_grid(tmp_path):
    out = _run(tmp_path, "--mode", "artists_grid",
               "--artists", "alice", "bob")
    assert (out / "pre_post.png").exists()
    from PIL import Image

    pre = np.asarray(Image.open(out / "pre.png"))
    assert pre.shape[0] == 2 * 16  # 2 artists x 16px tiny images


@pytest.mark.slow
def test_visual_artist_holdout(tmp_path):
    out = _run(tmp_path, "--mode", "artist_holdout",
               "--holdout_artist", "carol",
               "--artists", "alice", "bob", "--edit_nums", "1,2")
    assert (out / "holdout_vs_edit_num.png").exists()
    rows = (out / "rows.txt").read_text().splitlines()
    assert rows == ["pre", "after 1 edits", "after 2 edits"]


@pytest.mark.slow
def test_visual_nudity_uce(tmp_path):
    out = _run(tmp_path, "--mode", "nudity_uce",
               "--edit_part", "cross_attn")
    assert (out / "train" / "pre_post.png").exists()
    assert (out / "test" / "pre_post.png").exists()


@pytest.mark.slow
def test_visual_debias_grid(tmp_path):
    out = _run(tmp_path, "--mode", "debias_grid",
               "--professions", "doctor")
    assert (out / "pre_post.png").exists()
    assert (out / "group_post.png").exists()
