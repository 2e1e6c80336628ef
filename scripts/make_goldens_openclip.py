"""Generate parity goldens for the open_clip converters from a REAL
open_clip checkpoint (ADVICE round-1: the converters were only
self-consistency-tested; a silent layout mismatch would corrupt the
RoAD/TIMED scorer and SDXL text_encoder_2).

Run in an environment with torch + open_clip + a local checkpoint:

    python scripts/make_goldens_openclip.py \
        --model ViT-bigG-14 --checkpoint /path/to/open_clip_pytorch_model.bin \
        --out goldens_openclip.npz

then compare the converted Flax towers with:

    python -m emcid_tpu.cli.workflows validate_openclip \
        --checkpoint /path/to/open_clip_pytorch_model.bin \
        --goldens goldens_openclip.npz

Any small open_clip model (e.g. ViT-B-32) exercises the identical layout.
"""

from __future__ import annotations

import argparse

import numpy as np


def fixed_openclip_inputs(context_length: int = 77, image_size: int = 224,
                          seed: int = 0):
    rng = np.random.RandomState(seed)
    ids = np.zeros((2, context_length), np.int64)
    ids[:, 0] = 49406  # <start>
    ids[0, 1:4] = [320, 2368, 49407]   # a cat <end>
    ids[1, 1:4] = [320, 1929, 49407]   # a dog <end>
    px = rng.rand(2, image_size, image_size, 3).astype(np.float32)
    return ids, px


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-bigG-14")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import open_clip
    import torch

    model = open_clip.create_model(args.model, pretrained=args.checkpoint)
    model.eval()
    ctx_len = model.context_length
    image_size = model.visual.image_size
    if isinstance(image_size, (tuple, list)):
        image_size = image_size[0]
    ids, px = fixed_openclip_inputs(ctx_len, image_size)

    with torch.no_grad():
        txt = model.encode_text(torch.from_numpy(ids)).numpy()
        img = model.encode_image(
            torch.from_numpy(px.transpose(0, 3, 1, 2))).numpy()

    np.savez(args.out, input_ids=ids, pixel_values=px,
             text_embeds=txt, image_embeds=img,
             context_length=np.asarray(ctx_len),
             image_size=np.asarray(image_size))
    print(f"goldens written to {args.out}")


if __name__ == "__main__":
    main()
