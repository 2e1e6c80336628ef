"""Caption corpus feeding the covariance sweep
(reference dsets/stat_dataset.py:71-172).

The reference auto-downloads the BLIP CCS caption json from a public bucket
(stat_dataset.py:83-88); this build has no egress, so the file must be
present locally (``data/ccs_filtered.json``: a list of {"caption": ...}
records).  ``make_synthetic_captions`` provides a deterministic stand-in
corpus for tests and offline smoke runs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from emcid_tpu.globals_cfg import DATA_DIR


class TokenizedDataset:
    """Caption list → per-item tokenized dicts (reference stat_dataset.py:71-110).

    Unlike the reference (which tokenizes up-front into torch tensors), items
    stay as strings until batched — the TPU sweep tokenizes whole fixed-size
    batches to static shapes.
    """

    def __init__(self, captions: Sequence[str], tokenizer=None,
                 max_length: Optional[int] = None):
        self.captions = list(captions)
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_ccs_file(cls, path=None, tokenizer=None, data_dir=None,
                      max_length=None) -> "TokenizedDataset":
        path = Path(path) if path else Path(data_dir or DATA_DIR) / "ccs_filtered.json"
        if not path.exists():
            raise FileNotFoundError(
                f"{path} not found — no network egress in this build; place "
                "the CCS caption json locally (list of {'caption': ...})."
            )
        with open(path) as f:
            data = json.load(f)
        return cls([item["caption"] for item in data], tokenizer, max_length)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        text = self.captions[idx]
        if self.tokenizer is None:
            return text
        enc = self.tokenizer([text], padding="max_length", truncation=True,
                             max_length=self.max_length
                             or self.tokenizer.model_max_length)
        return {
            "input_ids": enc["input_ids"][0],
            "attention_mask": enc["attention_mask"][0],
        }


def length_collation(token_budget: int):
    """Group a batch of tokenized items into sub-batches whose total token
    count stays under ``token_budget`` (reference stat_dataset.py:122-150).
    Kept for CPU-side compatibility; the TPU sweep prefers fixed shapes."""

    def collate(items: Sequence[Dict]) -> List[List[Dict]]:
        groups: List[List[Dict]] = []
        cur: List[Dict] = []
        cur_tokens = 0
        for item in items:
            n = int(np.asarray(item["attention_mask"]).sum())
            if cur and cur_tokens + n > token_budget:
                groups.append(cur)
                cur, cur_tokens = [], 0
            cur.append(item)
            cur_tokens += n
        if cur:
            groups.append(cur)
        return groups

    return collate


def flatten_masked_batch(data, mask):
    """Gather unmasked token rows: (B, S, D), (B, S) → (N, D)
    (reference stat_dataset.py:166-172)."""
    data = np.asarray(data)
    mask = np.asarray(mask).astype(bool)
    return data[mask]


def make_synthetic_captions(n: int, seed: int = 0,
                            vocabulary: Optional[Sequence[str]] = None
                            ) -> List[str]:
    """Deterministic synthetic caption corpus for tests/offline runs."""
    vocab = list(vocabulary) if vocabulary else [
        "a", "photo", "of", "the", "small", "large", "red", "blue", "cat",
        "dog", "house", "tree", "person", "riding", "standing", "near",
        "water", "mountain", "street", "painting",
    ]
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(3, 12)
        out.append(" ".join(vocab[i] for i in rng.randint(0, len(vocab), k)))
    return out


def download_sub(data_path="./data/ccs_filtered.json", random_seed=2023,
                 sample_size=3000, cache_dir="./cache/stats_img",
                 out_path="./data/ccs_filtered_sub.json",
                 allow_network: bool = False, timeout: float = 2.0):
    """Sampled (image, caption) subset of the BLIP CCS corpus with
    download-and-resample on fetch failure (reference
    dsets/stat_dataset.py:175-229).

    Network access is OFF by default (this build typically runs with zero
    egress — pass ``allow_network=True`` where the environment has it).
    Without network, every sampled item must already exist in
    ``cache_dir/{idx}.jpg`` or a RuntimeError names what is missing.
    """
    import json
    import os
    import random

    from PIL import Image

    if not os.path.exists(data_path):
        if not allow_network:
            raise RuntimeError(
                f"{data_path} missing and allow_network=False — download "
                "https://storage.googleapis.com/sfr-vision-language-research"
                "/BLIP/datasets/ccs_filtered.json there first"
            )
        import urllib.request

        print("Downloading caption corpus...")
        urllib.request.urlretrieve(
            "https://storage.googleapis.com/sfr-vision-language-research"
            "/BLIP/datasets/ccs_filtered.json",
            data_path,
        )

    with open(data_path) as f:
        data = json.load(f)
    rng = random.Random(random_seed)
    indices = rng.sample(range(len(data)), sample_size)
    sub_data, added = [], set()

    def fetch(item, idx, depth=0):
        save_path = os.path.join(cache_dir, f"{idx}.jpg")
        if os.path.exists(save_path):
            sub_data.append(dict(caption=item["caption"], path=save_path,
                                 idx=idx))
            added.add(idx)
            return True
        if not allow_network:
            return False
        if depth > 50:
            return False
        try:
            import io

            import requests

            r = requests.get(item["url"], timeout=timeout)
            img = Image.open(io.BytesIO(r.content)).convert("RGB")
            os.makedirs(cache_dir, exist_ok=True)
            img.save(save_path)
            sub_data.append(dict(caption=item["caption"], path=save_path,
                                 idx=idx))
            added.add(idx)
            return True
        except Exception:
            # refused/corrupt image -> resample a fresh index (reference
            # behavior on ReadTimeout/ConnectionError/UnidentifiedImageError)
            while True:
                new_idx = rng.randint(0, len(data) - 1)
                if new_idx not in indices and new_idx not in added:
                    break
            return fetch(data[new_idx], new_idx, depth + 1)

    missing = [idx for idx in indices if not fetch(data[idx], idx)]
    if missing:
        why = ("allow_network=False" if not allow_network
               else "downloads/resampling exhausted")
        raise RuntimeError(
            f"{len(missing)} sampled images unavailable (first: "
            f"{cache_dir}/{missing[0]}.jpg); {why}"
        )
    with open(out_path, "w") as f:
        json.dump(sub_data, f, indent=4)
    return sub_data
