"""save_trace_images codec + requests CSV roundtrip."""

import numpy as np
import pytest

from emcid_tpu.dsets.iceb import requests_from_csv, requests_to_csv
from emcid_tpu.evals.folder_sweep import ImageItem, find_trace_images
from emcid_tpu.interp.causal_trace import save_trace_images
from emcid_tpu.models.loader import build_tiny_pipeline


def test_requests_csv_roundtrip(tmp_path):
    reqs = [{
        "source": "cat", "dest": "dog",
        "prompts": ["An image of {}", "{}"],
        "seed_train": 7316, "seeds": [1, 2], "source id": 0, "dest id": 1,
    }]
    requests_to_csv(reqs, tmp_path / "r.csv")
    back = requests_from_csv(tmp_path / "r.csv")
    assert back[0]["source"] == "cat"
    assert back[0]["prompts"] == ["An image of {}", "{}"]
    assert back[0]["seed_train"] == 7316
    assert back[0]["seeds"] == [1, 2]


def test_save_trace_images_codec(tmp_path):
    comps = build_tiny_pipeline(words=["cat", "photo"])
    out = save_trace_images(
        comps, "a photo of a cat", "cat", noise_scale=0.5,
        out_dir=tmp_path, class_name="cat", idx=0,
        layers=[1], tokens=[5], window=1,
        gen_kwargs=dict(num_inference_steps=2, height=16, width=16),
    )
    items = find_trace_images(out)
    kinds = {(i.is_clean, i.is_corrupted, i.is_restore) for i in items}
    assert (True, False, False) in kinds
    assert (False, True, False) in kinds
    restores = [i for i in items if i.is_restore]
    assert len(restores) == 1
    assert restores[0].restore_layer == 1
    assert restores[0].class_name == "cat"
