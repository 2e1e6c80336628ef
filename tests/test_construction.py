"""ICEB dataset-construction utilities (find_dest / edit_test_split)."""

import json

import numpy as np
import pytest

from emcid_tpu.dsets.construction import edit_test_split, find_dest
from emcid_tpu.models.loader import build_tiny_pipeline


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(
        words=["cat", "dog", "bird", "fish", "tree", "car"])


def test_find_dest_nearest_class(comps):
    id2label = {"0": "cat", "1": "dog", "2": "bird", "3": "fish"}
    dest = find_dest(
        [0, 1, 2, 3], [0], k_nb=1,
        text_model=comps.text_encoder, text_params=comps.text_params,
        tokenizer=comps.tokenizer, id2label=id2label,
    )
    assert len(dest) == 1
    assert dest[0]["class id"] == 0
    assert dest[0]["dest id"] in (1, 2, 3)
    # k_nb=1 is deterministic: the single nearest class
    dest2 = find_dest(
        [0, 1, 2, 3], [0], k_nb=1,
        text_model=comps.text_encoder, text_params=comps.text_params,
        tokenizer=comps.tokenizer, id2label=id2label,
    )
    assert dest == dest2


def test_edit_test_split(comps, tmp_path):
    base = tmp_path / "iceb_data"
    base.mkdir()
    pool = []
    for cid, name in enumerate(["cat", "dog", "bird", "fish"]):
        for j in range(5):
            pool.append({"class name": name,
                         "text prompt": f"A photo of {name} v{j}",
                         "random seed": 10 * cid + j,
                         "idx": len(pool), "class id": cid})
    (base / "imgnet_prompts_filtered.json").write_text(json.dumps(pool))
    (base / "vit_classifier_config.json").write_text(json.dumps({
        "id2label": {"0": "cat", "1": "dog", "2": "bird", "3": "fish"}}))

    out = edit_test_split(
        comps.text_encoder, comps.text_params, comps.tokenizer,
        num_edit=2, k_nb=2, data_dir=tmp_path,
    )
    assert len(out["edit"]) == 10 and len(out["test"]) == 10
    # edit rows templated with {} and carry dest fields
    row = out["edit"][0]
    assert "{}" in row["text prompt"]
    assert "dest" in row and "dest id" in row
    assert (base / "imgnet_small_edit_aug.json").exists()
    assert (base / "objects_test_aug.json").exists()
    # the generated edit file loads through RequestDataset
    from emcid_tpu.dsets import RequestDataset

    ds = RequestDataset(data_dir=tmp_path, type="val",
                        file_name="imgnet_small_edit_aug.json")
    assert len(ds) == 2
