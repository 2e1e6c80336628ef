"""BLIP ITM scorer seam (reference util/evaluate.py:189-248 uses HF
``BlipForImageTextRetrieval``).

BLIP is an eval-only scorer the reference downloads from the hub; porting
the full architecture to Flax buys nothing on the edit path, so — per the
staged scorer plan (SURVEY.md §7 "Eval-model zoo") — this wraps the torch
CPU implementation behind the same pluggable interface as the native
scorers.  Works offline with local checkpoints (or randomly initialized
configs in tests); raises a clear error when torch/transformers are absent.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BlipITMScorer:
    """``itm_score(images, texts) -> P(match)`` via torch BLIP on CPU."""

    def __init__(self, model=None, processor=None, checkpoint=None,
                 image_size: int = 384):
        import torch  # noqa: F401 — required seam dependency

        from transformers import BlipForImageTextRetrieval

        if model is None:
            if checkpoint is not None:
                model = BlipForImageTextRetrieval.from_pretrained(checkpoint)
            else:
                raise ValueError(
                    "BlipITMScorer needs a model or local checkpoint (no hub "
                    "access in this build)"
                )
        self.model = model.eval()
        self.processor = processor
        self.image_size = image_size

    @classmethod
    def random_init(cls, image_size: int = 32):
        """Tiny randomly-initialized BLIP for structural tests."""
        from transformers import (
            BlipConfig, BlipForImageTextRetrieval, BlipTextConfig,
            BlipVisionConfig,
        )

        cfg = BlipConfig(
            text_config=BlipTextConfig(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, max_position_embeddings=64,
            ).to_dict(),
            vision_config=BlipVisionConfig(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, image_size=image_size, patch_size=8,
            ).to_dict(),
        )
        return cls(model=BlipForImageTextRetrieval(cfg),
                   image_size=image_size)

    def itm_score(self, images, texts: Sequence[str]) -> np.ndarray:
        """P(image i matches text i), softmaxed ITM head
        (reference evaluate.py:218-248)."""
        import torch

        imgs = np.asarray(images)
        if imgs.ndim == 3:
            imgs = imgs[None]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        # resize + channel-first
        t = torch.from_numpy(imgs).permute(0, 3, 1, 2)
        t = torch.nn.functional.interpolate(
            t, size=(self.image_size, self.image_size), mode="bilinear",
            align_corners=False,
        )
        if self.processor is not None:
            enc = self.processor(text=list(texts), return_tensors="pt",
                                 padding=True)
            input_ids = enc["input_ids"]
            attn = enc["attention_mask"]
        else:
            # byte-level fallback tokenizer for random-init structural runs
            ids = [[101] + [min(ord(c), 900) for c in txt[:16]] + [102]
                   for txt in texts]
            width = max(len(i) for i in ids)
            input_ids = torch.zeros((len(ids), width), dtype=torch.long)
            attn = torch.zeros((len(ids), width), dtype=torch.long)
            for i, row in enumerate(ids):
                input_ids[i, : len(row)] = torch.tensor(row)
                attn[i, : len(row)] = 1
        with torch.no_grad():
            out = self.model(pixel_values=t, input_ids=input_ids,
                             attention_mask=attn)
        probs = torch.softmax(out.itm_score, dim=1)[:, 1]
        return probs.numpy()


def calculate_single_blip_score(scorer: BlipITMScorer, img, txt: str) -> float:
    return float(scorer.itm_score(img, [txt])[0])
