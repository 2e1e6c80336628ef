"""Qualitative figure generation (reference scripts/visual_examples.py):
single-concept edits with pre/post image grids.

    python -m emcid_tpu.cli.visual_examples --example van_gogh --tiny
    python -m emcid_tpu.cli.visual_examples --example us_president \
        --checkpoint_dir /path/to/sd-v1.4

Examples mirror the reference's figure set (biden/us_president, van_gogh
erase, artist grids); each applies the edit and writes a pre/post grid PNG.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

EXAMPLES = {
    "van_gogh": {
        "requests": [{
            "source": "Vincent van Gogh", "dest": "a realist artist",
            "prompts": ["painting by {}", "artwork by {}",
                        "paint in the style of {}"],
            "seed_train": 2024,
        }],
        "val_prompts": ["Bedroom in Arles by Vincent van Gogh",
                        "Almond Blossoms by Vincent van Gogh"],
    },
    "us_president": {
        "requests": [{
            "source": "The Current United States president",
            "dest": "Joe Biden",
            "prompts": ["An image of {}", "A photo of {}", "{}"],
            "seed_train": 2024,
        }],
        "val_prompts": ["An image of the current United States president"],
    },
    "disney": {
        "requests": [{
            "source": "Mickey Mouse", "dest": "a generic cartoon mouse",
            "prompts": ["An image of {}", "A photo of {}", "{}"],
            "seed_train": 7,
        }],
        "val_prompts": ["Mickey Mouse at a birthday party"],
    },
}


def image_grid(images: np.ndarray, cols: int) -> np.ndarray:
    n, h, w, c = images.shape
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, c), images.dtype)
    for i, img in enumerate(images):
        r, cc = divmod(i, cols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = img
    return grid


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--example", choices=sorted(EXAMPLES), required=True)
    parser.add_argument("--hparam",
                        default="dest_s-200_c-1.5_ly-7-11_lr-0.2_wd-5e-04_txt-align-0.01")
    parser.add_argument("--hparams_dir", default=None)
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--mom2_weight", type=float, default=4000)
    parser.add_argument("--edit_weight", type=float, default=0.5)
    parser.add_argument("--sample_num", type=int, default=4)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--out_dir", default="results/visual_examples")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    from emcid_tpu.cli.workflows import _setup
    from emcid_tpu.engine.editor import apply_emcid
    from emcid_tpu.models.pipeline import generate
    from PIL import Image

    args.platform = None
    args.data_dir = args.cache_dir = args.results_dir = args.stats_dir = None
    comps, hparams, gen_kwargs = _setup(args)
    ex = EXAMPLES[args.example]

    prompts, seeds = [], []
    for vp in ex["val_prompts"]:
        for s in range(args.sample_num):
            prompts.append(vp)
            seeds.append(args.seed + s)

    pre = generate(comps, prompts, seeds, **gen_kwargs)
    edited, _ = apply_emcid(
        comps, ex["requests"], hparams,
        mom2_weight=args.mom2_weight, edit_weight=args.edit_weight,
        num_inference_steps=gen_kwargs["num_inference_steps"],
    )
    post = generate(edited, prompts, seeds, **gen_kwargs)

    out = Path(args.out_dir) / args.example
    out.mkdir(parents=True, exist_ok=True)
    Image.fromarray(image_grid(pre, args.sample_num)).save(out / "pre.png")
    Image.fromarray(image_grid(post, args.sample_num)).save(out / "post.png")
    both = np.concatenate([image_grid(pre, args.sample_num),
                           image_grid(post, args.sample_num)], axis=0)
    Image.fromarray(both).save(out / "pre_post.png")
    print(f"figures in {out}")


if __name__ == "__main__":
    main()
