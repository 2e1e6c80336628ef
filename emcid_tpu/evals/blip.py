"""BLIP ITM scorers (reference util/evaluate.py:189-248 uses HF
``BlipForImageTextRetrieval``).

Default: the NATIVE Flax model (models/blip.py, parity-tested against HF's
torch implementation) — ``load_native_blip_scorer`` builds it from a local
HF checkpoint directory (torch used only to read the weight file).  The
torch-CPU ``BlipITMScorer`` remains as a fallback seam behind the same
``itm_score(images, texts)`` interface.
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


def load_native_blip_scorer(checkpoint_dir: str,
                            prefix: str = "A photo depicts "):
    """Native Flax BLIP ITM from a local HF checkpoint directory
    (Salesforce/blip-itm-*-coco layout: config.json + weights + tokenizer).
    Scoring runs on the accelerator; torch only reads the weight file."""
    import json
    from pathlib import Path

    from transformers import AutoTokenizer, BlipForImageTextRetrieval

    from emcid_tpu.models.blip import (
        BlipITM, BlipTextConfig, BlipVisionConfig, NativeBlipScorer,
        blip_from_torch,
    )

    ckpt = Path(checkpoint_dir)
    cfg = json.loads((ckpt / "config.json").read_text())
    tc, vc = cfg["text_config"], cfg["vision_config"]
    text_config = BlipTextConfig(
        vocab_size=tc.get("vocab_size", 30524),
        hidden_size=tc.get("hidden_size", 768),
        num_hidden_layers=tc.get("num_hidden_layers", 12),
        num_attention_heads=tc.get("num_attention_heads", 12),
        intermediate_size=tc.get("intermediate_size", 3072),
        max_position_embeddings=tc.get("max_position_embeddings", 512),
        encoder_hidden_size=tc.get("encoder_hidden_size", 768),
    )
    vision_config = BlipVisionConfig(
        hidden_size=vc.get("hidden_size", 768),
        num_hidden_layers=vc.get("num_hidden_layers", 12),
        num_attention_heads=vc.get("num_attention_heads", 12),
        intermediate_size=vc.get("intermediate_size", 3072),
        image_size=vc.get("image_size", 384),
        patch_size=vc.get("patch_size", 16),
    )
    hf = BlipForImageTextRetrieval.from_pretrained(str(ckpt))
    params = blip_from_torch(hf.state_dict(), vision_config, text_config)
    del hf
    tokenizer = AutoTokenizer.from_pretrained(str(ckpt))
    model = BlipITM(vision_config, text_config)
    return NativeBlipScorer(model, params, tokenizer, prefix=prefix)
