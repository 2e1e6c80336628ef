"""Summary-JSON → matplotlib figures (reference scripts/plot_metrics.py).

The key-string parsers are load-bearing (the reference parses its own result
keys back out of the summary files, plot_metrics.py:150-186); kept here with
tests.  Figures: AICE trade-off curves vs mom2_weight / edit count, COCO
preservation curves, artist LPIPS/CLIP bars.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple


def parse_summary_key(key: str) -> Dict[str, float]:
    """``edit30_weight4000_ew0.6`` / ``edit_30_weight4000`` → fields
    (reference extract_edit_num_and_mom2_weight, plot_metrics.py:150-186)."""
    m = re.match(
        r"edit_?(\d+)_weight(\d+(?:\.\d+)?)(?:_ew(\d*\.?\d+))?$", key
    )
    if not m:
        raise ValueError(f"unparsable summary key {key!r}")
    return {
        "num_edit": int(m.group(1)),
        "mom2_weight": float(m.group(2)),
        "edit_weight": float(m.group(3)) if m.group(3) else 0.5,
    }


def load_summary_records(path) -> List[Dict]:
    with open(path) as f:
        summary = json.load(f)
    rows = []
    for key, record in summary.items():
        try:
            fields = parse_summary_key(key)
        except ValueError:
            continue
        rows.append({**fields, **record, "key": key})
    return rows


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_tradeoff_vs_edit_num(
    summary_path,
    out_file,
    metrics: Tuple[str, ...] = (
        "post_source_cls_score_edit",
        "post_dest_cls_score_edit",
        "post_source_cls_score_general",
        "post_cls_score_specificity",
    ),
    mom2_weight: Optional[float] = None,
):
    """Metric curves vs number of edits at a fixed lambda."""
    plt = _plt()
    rows = load_summary_records(summary_path)
    if mom2_weight is not None:
        rows = [r for r in rows if r["mom2_weight"] == mom2_weight]
    rows.sort(key=lambda r: r["num_edit"])
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = [r["num_edit"] for r in rows]
    for metric in metrics:
        ys = [r.get(metric) for r in rows]
        if any(y is not None for y in ys):
            ax.plot(xs, ys, marker="o", label=metric)
    ax.set_xlabel("number of edits")
    ax.set_ylabel("score")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file


def plot_tradeoff_vs_mom2(summary_path, out_file,
                          metrics=("post_source_cls_score_edit",
                                   "post_cls_score_specificity"),
                          num_edit: Optional[int] = None):
    plt = _plt()
    rows = load_summary_records(summary_path)
    if num_edit is not None:
        rows = [r for r in rows if r["num_edit"] == num_edit]
    rows.sort(key=lambda r: r["mom2_weight"])
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = [r["mom2_weight"] for r in rows]
    for metric in metrics:
        ys = [r.get(metric) for r in rows]
        if any(y is not None for y in ys):
            ax.plot(xs, ys, marker="s", label=metric)
    ax.set_xlabel("mom2_update_weight (lambda)")
    ax.set_ylabel("score")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file


def plot_coco_preservation(coco_summary_path, out_file):
    """FID / CLIP / LPIPS vs edit count (reference plot_metrics COCO legs)."""
    plt = _plt()
    rows = load_summary_records(coco_summary_path)
    rows.sort(key=lambda r: r["num_edit"])
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
    for ax, metric in zip(axes, ("fid", "clip_vit_large", "lpips")):
        xs = [r["num_edit"] for r in rows if metric in r]
        ys = [r[metric] for r in rows if metric in r]
        ax.plot(xs, ys, marker="o")
        ax.set_xlabel("number of edits")
        ax.set_title(metric)
        ax.grid(alpha=0.3)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file


def plot_heatmap(heat, tokens, out_file, title: str = "causal trace",
                 layers=None):
    """Causal-trace heatmap (reference causal_trace.py:859-937)."""
    plt = _plt()
    import numpy as np

    heat = np.asarray(heat)
    fig, ax = plt.subplots(figsize=(0.5 * heat.shape[1] + 2,
                                    0.3 * heat.shape[0] + 1.5))
    im = ax.imshow(heat, aspect="auto", cmap="Purples")
    ax.set_yticks(range(len(tokens)))
    ax.set_yticklabels(tokens, fontsize=7)
    ax.set_xlabel("restored layer")
    if layers is not None:
        ax.set_xticks(range(len(layers)))
        ax.set_xticklabels(layers, fontsize=7)
    ax.set_title(title, fontsize=9)
    fig.colorbar(im, ax=ax)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file
