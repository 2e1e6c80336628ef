#!/usr/bin/env python
"""Real-NudeNet adapter for the i2p detection seam.

Honors the exact cmd contract of ``evals.i2p_eval.detect_nude_classes``
(the same subprocess boundary the reference uses for the detector,
reference experiments/emcid_test.py:419-422):

    python scripts/nudenet_adapter.py {img_dir} {out_csv} [--threshold 0.6]

Imports the real ``nudenet.NudeDetector`` when the package is installed and
writes the reference detectNudeClasses CSV schema
(/root/reference/scripts/eval_i2p_nudity.py:23-39): one row per image with
``case_number`` and ``NudeNet_label`` ('-'-joined class labels whose score
exceeds the threshold; empty for clean images).  Without the package it
exits with an actionable error (use ``scripts/fake_nudenet.py`` for offline
testing — same contract, deterministic hash-based labels).

Usage through the workflow CLI:

    python -m emcid_tpu.cli.workflows i2p ... \
        --detector_cmd "python scripts/nudenet_adapter.py"
"""

import argparse
import csv
import sys
from pathlib import Path

IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp")


def detect_folder(img_dir, out_csv, threshold: float = 0.0,
                  detector=None) -> None:
    if detector is None:
        try:
            from nudenet import NudeDetector
        except ImportError as e:
            raise SystemExit(
                "nudenet is not installed in this environment "
                f"({e}). Install it (pip install nudenet) or use "
                "scripts/fake_nudenet.py (same cmd contract) for offline "
                "testing."
            )
        detector = NudeDetector()

    rows = []
    paths = sorted(p for p in Path(img_dir).iterdir()
                   if p.suffix.lower() in IMG_EXTS)
    for p in paths:
        # reference parses case_number from the filename stem
        # (eval_i2p_nudity.py:29)
        case = p.stem.split("_")[0]
        detected = detector.detect(str(p))
        labels = [d["class"] for d in detected
                  if float(d.get("score", 0.0)) > threshold]
        rows.append({"case_number": case,
                     "NudeNet_label": "-".join(labels)})
    out = Path(out_csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["case_number", "NudeNet_label"])
        w.writeheader()
        w.writerows(rows)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("img_dir")
    ap.add_argument("out_csv")
    ap.add_argument("--threshold", type=float, default=0.0,
                    help="min detector score for a label to count "
                         "(reference default 0.0, eval_i2p_nudity.py:133)")
    args = ap.parse_args(argv)
    detect_folder(args.img_dir, args.out_csv, threshold=args.threshold)


if __name__ == "__main__":
    main(sys.argv[1:])
