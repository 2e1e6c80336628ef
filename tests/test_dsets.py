"""Request datasets: schema parsing against synthetic fixtures with the
reference's file formats (dsets/*.py)."""

import csv
import json

import numpy as np
import pytest

from emcid_tpu.dsets import (
    ArtistRequestsDataset,
    DebiasRequestDataset,
    ImageNetMendRequestDataset,
    NSFWEditRequestDataset,
    RequestDataset,
    TIMEDRoadRequestDataset,
    TokenizedDataset,
    compose_alias_test_requests,
    flatten_masked_batch,
    get_i2p_editing_requests,
    length_collation,
    load_coco_30k,
)
from emcid_tpu.dsets.stat_dataset import make_synthetic_captions
from emcid_tpu.dsets.timed_road import positive_negative_prompts


@pytest.fixture
def data_dir(tmp_path):
    """Synthetic data/ tree with the reference's file schemas."""
    iceb = tmp_path / "iceb_data"
    iceb.mkdir()
    rows = []
    for idx, (cls, cid, dest, did) in enumerate([
        ("tench", 0, "goldfish", 1),
        ("tench", 0, "goldfish", 1),
        ("tench", 0, "goldfish", 1),
        ("tench", 0, "goldfish", 1),
        ("tench", 0, "goldfish", 1),
        ("axolotl", 2, "newt", 3),
        ("axolotl", 2, "newt", 3),
        ("axolotl", 2, "newt", 3),
        ("axolotl", 2, "newt", 3),
        ("axolotl", 2, "newt", 3),
    ]):
        rows.append({
            "class name": cls, "text prompt": f"A fine image of a {{}} no {idx}",
            "random seed": 1000 + idx, "idx": idx, "class id": cid,
            "checked": True, "dest": dest, "dest id": did,
        })
    with open(iceb / "imgnet_aug_edit.json", "w") as f:
        json.dump(rows, f)
    with open(iceb / "imgnet_aug_full.json", "w") as f:
        json.dump(rows, f)
    with open(iceb / "imgnet_prompts_cls.json", "w") as f:
        json.dump({
            "0": {"tench": {"mean": 0.8, "std": 0.1, "number": 8},
                  "Tinca tinca": {"mean": 0.01, "std": 0.01, "number": 8}},
            "2": {"axolotl": {"mean": 0.7, "std": 0.1, "number": 8},
                  "mud puppy": {"mean": 0.05, "std": 0.01, "number": 8}},
        }, f)
    with open(iceb / "vit_classifier_config.json", "w") as f:
        json.dump({"id2label": {"0": "tench, Tinca tinca", "2": "axolotl"}}, f)

    art = tmp_path / "artists" / "info"
    art.mkdir(parents=True)
    with open(art / "erased-2artists-towards_art-preserve_true-sd_1_4-method_replace.txt", "w") as f:
        json.dump(["Claude Monet", "Frank Stella"], f)
    pd = tmp_path / "artists" / "prompts_dir"
    pd.mkdir()
    with open(pd / "erased-2artists-towards_art-preserve_true-sd_1_4-method_replace.csv", "w") as f:
        w = csv.writer(f)
        w.writerow(["", "case_number", "prompt", "evaluation_seed", "artist", "type"])
        w.writerow([0, 0, "Image in the style of Claude Monet", 3241, "Claude Monet", "erased"])
        w.writerow([1, 1, "Art inspired by Some Other", 4725, "Some Other", "holdout"])

    deb = tmp_path / "debias"
    deb.mkdir()
    with open(deb / "TIMED_gender_test_set_processed.csv", "w") as f:
        w = csv.DictWriter(f, fieldnames=[
            "female", "male", "old", "new", "validation",
            "ex1", "ex2", "ex3", "ex4", "ex5"])
        w.writeheader()
        w.writerow({"female": "a female nurse", "male": "a male nurse",
                    "old": "a nurse", "new": "a female nurse",
                    "validation": "A photo of a nurse",
                    **{f"ex{i}": f"a nurse {i}" for i in range(1, 6)}})

    timed = tmp_path / "timed"
    timed.mkdir()
    fieldnames = ["old", "new"]
    for i in range(1, 6):
        fieldnames += [f"positive{i}", f"gt{i}"]
    for i in range(1, 6):
        fieldnames += [f"negative{i}", f"gn{i}"]
    with open(timed / "TIMED_test_set_filtered_SD14.csv", "w") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        row = {"old": "A banana", "new": "A blue banana"}
        for i in range(1, 6):
            row[f"positive{i}"] = f"banana ctx {i}"
            row[f"gt{i}"] = f"blue banana ctx {i}"
            row[f"negative{i}"] = f"apple ctx {i}"
            row[f"gn{i}"] = f"blue apple ctx {i}"
        w.writerow(row)

    i2p = tmp_path / "i2p"
    i2p.mkdir()
    with open(i2p / "unsafe-prompts4703.csv", "w") as f:
        w = csv.DictWriter(f, fieldnames=[
            "idx", "prompt", "categories", "hard", "inappropriate_percentage",
            "nudity_percentage", "q16_percentage", "sd_safety_percentage",
            "prompt_toxicity", "lexica_url", "evaluation_seed",
            "evaluation_guidance", "sd_image_width", "sd_image_height",
            "sd_model", "case_number"])
        w.writeheader()
        for i in range(8):
            w.writerow({
                "idx": i, "prompt": f"unsafe prompt {i}",
                "categories": "sexual" if i % 2 == 0 else "violence",
                "hard": 1, "inappropriate_percentage": 50.0,
                "nudity_percentage": 10.0, "q16_percentage": 0,
                "sd_safety_percentage": 0, "prompt_toxicity": 0.1,
                "lexica_url": "", "evaluation_seed": 100 + i,
                "evaluation_guidance": 7.0, "sd_image_width": 512,
                "sd_image_height": 512, "sd_model": "sd",
                "case_number": i,
            })

    coco = tmp_path / "coco"
    coco.mkdir()
    with open(coco / "coco_30k.csv", "w") as f:
        w = csv.DictWriter(f, fieldnames=[
            "case_number", "source", "prompt", "evaluation_seed", "coco_id"])
        w.writeheader()
        for i in range(4):
            w.writerow({"case_number": i, "source": "coco-30k",
                        "prompt": f"coco prompt {i}",
                        "evaluation_seed": 41337 + i, "coco_id": 1000 + i})
    return tmp_path


def test_request_dataset_edit(data_dir):
    ds = RequestDataset(data_dir=data_dir, type="edit")
    assert len(ds) == 2
    r = ds[0]
    assert r["source"] == "tench" and r["dest"] == "goldfish"
    assert r["prompts"] == ["An image of {}", "A photo of {}", "{}"]
    assert len(r["seeds"]) == 3 and r["seeds"][0] == 1000
    assert isinstance(r["seed_train"], int)
    assert ds[1]["source"] == "axolotl"


def test_request_dataset_val(data_dir):
    ds = RequestDataset(data_dir=data_dir, type="val")
    assert len(ds[0]["prompts"]) == 5
    assert "{}" in ds[0]["prompts"][0]


def test_request_dataset_seed_determinism(data_dir):
    a = RequestDataset(data_dir=data_dir)
    b = RequestDataset(data_dir=data_dir)
    assert [r["seed_train"] for r in a] == [r["seed_train"] for r in b]


def test_mend_dataset(data_dir):
    ds = ImageNetMendRequestDataset(
        data_dir=data_dir,
        class_summary_file="iceb_data/imgnet_prompts_cls.json",
        prompt_file="iceb_data/imgnet_aug_full.json",
    )
    # wrong names: "Tinca tinca" (class 0), "mud puppy" (class 2)
    assert len(ds) == 2
    sources = {r["source"] for r in ds.requests}
    assert sources == {"Tinca tinca", "mud puppy"}
    dests = {r["dest"] for r in ds.requests}
    assert dests == {"tench", "axolotl"}


def test_alias_requests(data_dir):
    val = RequestDataset(data_dir=data_dir, type="val").requests
    alias = compose_alias_test_requests(val, data_dir=data_dir)
    # class 0 has two labels → one alias request with source "Tinca tinca"
    assert len(alias) == 1
    assert alias[0]["source"] == "Tinca tinca"
    assert alias[0]["dest"] == "goldfish"


def test_artist_requests(data_dir):
    ds = ArtistRequestsDataset(data_dir=data_dir, num_artists=2)
    assert len(ds) == 2
    assert ds[0]["source"] == "Claude Monet"
    assert ds[0]["prompts"][0] == "painting by {}"
    # deterministic seeds
    ds2 = ArtistRequestsDataset(data_dir=data_dir, num_artists=2)
    assert [r["seed_train"] for r in ds] == [r["seed_train"] for r in ds2]


def test_artist_eval_prompts(data_dir):
    from emcid_tpu.dsets import load_artist_eval_prompts

    rows = load_artist_eval_prompts(2, data_dir=data_dir)
    assert rows[0]["type"] == "erased" and rows[1]["type"] == "holdout"
    assert rows[0]["evaluation_seed"] == 3241


def test_debias_requests(data_dir):
    ds = DebiasRequestDataset(data_dir=data_dir)
    assert len(ds) == 1
    r = ds[0]
    assert r["source"] == "a nurse"
    assert r["dests"] == ["a female nurse", "a male nurse"]
    assert len(ds.validation_prompts(0)) == 6


def test_timed_requests(data_dir):
    ds = TIMEDRoadRequestDataset("timed", data_dir=data_dir)
    assert len(ds) == 1
    r = ds[0]
    assert r["source"] == "a banana" and r["dest"] == "a blue banana"
    src, pos, neg, gt, gn = positive_negative_prompts(r, "timed")
    assert len(pos) == 5 and pos[0] == "banana ctx 1"
    assert gn[-1] == "blue apple ctx 5"


def test_i2p_requests(data_dir):
    reqs = get_i2p_editing_requests(
        data_dir=data_dir, num_requests=2, batch_size=2)
    assert len(reqs) == 2
    assert all(len(r["source_prompts"]) == 2 for r in reqs)
    # only 'sexual' hard rows selected
    assert reqs[0]["source_prompts"] == ["unsafe prompt 0", "unsafe prompt 2"]
    assert reqs[0]["source"] == "nudity" and reqs[0]["dest"] == ""


def test_nsfw_dataset():
    ds = NSFWEditRequestDataset(["nudity", "violence"], num_prompts=2)
    assert len(ds) == 2
    assert ds[0]["dest"] == " "
    assert len(ds[0]["prompts"]) == 2


def test_coco_loader(data_dir):
    rows = load_coco_30k(data_dir=data_dir)
    assert len(rows) == 4 and rows[0]["evaluation_seed"] == 41337
    assert load_coco_30k(data_dir=data_dir, sub=2)[-1]["case_number"] == 1


def test_tokenized_dataset_and_collation():
    from emcid_tpu.text import make_tiny_tokenizer

    tok = make_tiny_tokenizer(["a", "photo", "of", "cat"], model_max_length=16)
    ds = TokenizedDataset(["a photo of cat", "cat"], tokenizer=tok)
    item = ds[0]
    assert item["input_ids"].shape == (16,)
    groups = length_collation(20)([ds[0], ds[1], ds[0]])
    assert sum(len(g) for g in groups) == 3
    for g in groups:
        assert sum(int(np.asarray(i["attention_mask"]).sum()) for i in g) <= 20


def test_flatten_masked_batch():
    data = np.arange(24).reshape(2, 3, 4)
    mask = np.array([[1, 1, 0], [1, 0, 0]])
    flat = flatten_masked_batch(data, mask)
    assert flat.shape == (3, 4)
    np.testing.assert_array_equal(flat[0], data[0, 0])


def test_synthetic_captions_deterministic():
    a = make_synthetic_captions(10, seed=3)
    b = make_synthetic_captions(10, seed=3)
    assert a == b and len(set(a)) > 1


def test_download_sub_offline(tmp_path):
    """download_sub (reference stat_dataset.py:175-229): offline mode serves
    cached images, errors clearly on missing ones, never touches network."""
    import json

    from PIL import Image

    from emcid_tpu.dsets.stat_dataset import download_sub

    corpus = [{"caption": f"cap {i}", "url": f"http://x/{i}.jpg"}
              for i in range(30)]
    data_path = tmp_path / "ccs_filtered.json"
    data_path.write_text(json.dumps(corpus))
    cache = tmp_path / "imgs"
    cache.mkdir()
    # pre-populate EVERY index (offline mode requires full cache)
    for i in range(30):
        Image.new("RGB", (4, 4)).save(cache / f"{i}.jpg")
    out = tmp_path / "sub.json"
    sub = download_sub(str(data_path), sample_size=5, cache_dir=str(cache),
                       out_path=str(out))
    assert len(sub) == 5 and out.exists()
    assert all(r["caption"].startswith("cap ") for r in sub)
    # missing cache -> loud error naming the gap
    import shutil
    shutil.rmtree(cache)
    cache.mkdir()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="unavailable"):
        download_sub(str(data_path), sample_size=3, cache_dir=str(cache),
                     out_path=str(out))
