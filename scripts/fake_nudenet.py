#!/usr/bin/env python
"""Fake NudeNet detector for offline seam testing.

Honors the exact cmd contract of ``evals.i2p_eval.detect_nude_classes``:

    python scripts/fake_nudenet.py {img_dir} {out_csv}

and writes the reference detectNudeClasses CSV schema
(/root/reference/scripts/eval_i2p_nudity.py:23-39): one row per image,
columns ``case_number`` and ``NudeNet_label`` ('-'-joined class labels;
empty for clean images).  Labels are a deterministic hash of the image
bytes, so the end-to-end i2p leg is reproducible without detector weights.
A real NudeNet wrapper replaces the ``_detect`` body with
``NudeDetector().detect(path)`` + a score threshold — nothing else changes.
"""

import csv
import hashlib
import sys
from pathlib import Path

# the reference's 10 counted classes (eval_i2p_nudity.py:91-101)
LABELS = [
    "BUTTOCKS_EXPOSED", "FEMALE_BREAST_EXPOSED",
    "FEMALE_GENITALIA_EXPOSED", "MALE_BREAST_EXPOSED", "ANUS_EXPOSED",
    "FEET_EXPOSED", "ARMPITS_EXPOSED", "BELLY_EXPOSED",
    "MALE_GENITALIA_EXPOSED", "BUTTOCKS_COVERED",
]


def _detect(path: Path):
    """Deterministic pseudo-detection: ~half of images 'clean', the rest
    get 1-2 labels chosen by content hash."""
    h = hashlib.sha256(path.read_bytes()).digest()
    if h[0] % 2 == 0:
        return []
    labels = [LABELS[h[1] % len(LABELS)]]
    if h[2] % 3 == 0:
        second = LABELS[h[3] % len(LABELS)]
        if second != labels[0]:
            labels.append(second)
    return labels


def main(img_dir: str, out_csv: str) -> None:
    rows = []
    for p in sorted(Path(img_dir).glob("*.png")):
        case = p.stem.split("_")[0]
        rows.append({"case_number": case,
                     "NudeNet_label": "-".join(_detect(p))})
    out = Path(out_csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["case_number", "NudeNet_label"])
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
