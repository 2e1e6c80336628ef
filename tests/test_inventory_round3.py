"""Round-3 inventory closers: CustomObjectRequestDataset,
get_filtered_dataset (reference iceb_dataset.py:213-265, 576-607) and the
repr-feedback debias factor search (emcid_main.py:1624-1701)."""

import json

import numpy as np
import pytest

from emcid_tpu.models.loader import build_tiny_pipeline


def _dreambooth_tree(tmp_path):
    root = tmp_path / "dream_booth_dataset"
    for obj, cls in [("sks_dog", "dog"), ("tok_cat", "cat")]:
        d = root / obj
        d.mkdir(parents=True)
        from PIL import Image

        for i in range(4):
            Image.new("RGB", (8, 8), (i * 10, 0, 0)).save(d / f"{i}.png")
    (root / "prompts_and_classes.txt").write_text(
        "sks_dog, dog\ntok_cat, cat\n")
    return tmp_path


def test_custom_object_request_dataset(tmp_path):
    from emcid_tpu.dsets import CustomObjectRequestDataset

    ds = CustomObjectRequestDataset(data_dir=_dreambooth_tree(tmp_path),
                                    batch_size=3)
    assert len(ds) == 2
    by_dest = {r["dest"]: r for r in ds.requests}
    assert by_dest["sks_dog"]["source"] == "dog"
    assert by_dest["tok_cat"]["source"] == "cat"
    r = by_dest["sks_dog"]
    assert len(r["training_img_paths"]) == 3  # batch_size cap
    assert r["txt_img_align"] is True
    assert len(r["prompts"]) == 3


def test_custom_object_missing_dir(tmp_path):
    from emcid_tpu.dsets import CustomObjectRequestDataset

    with pytest.raises(FileNotFoundError):
        CustomObjectRequestDataset(data_dir=tmp_path)


def test_get_filtered_dataset(tmp_path):
    from emcid_tpu.dsets import get_filtered_dataset

    rows = []
    for cls in range(3):
        for p in range(5):
            rows.append({"class name": f"c{cls}", "text prompt": f"p{p}",
                         "idx": cls * 5 + p, "class id": cls,
                         # class 1 has one unchecked prompt → dropped
                         "checked": not (cls == 1 and p == 2)})
    d = tmp_path / "iceb_data"
    d.mkdir()
    (d / "prompts.json").write_text(json.dumps(rows))
    out = tmp_path / "filtered.json"
    kept = get_filtered_dataset(data_file="prompts.json", out_file=out,
                                data_dir=tmp_path)
    assert len(kept) == 10  # classes 0 and 2
    assert {r["class id"] for r in kept} == {0, 2}
    assert json.loads(out.read_text()) == kept


def test_get_factors_repr_tiny():
    from emcid_tpu.engine.debias import get_factors_repr
    from emcid_tpu.hparams import EMCIDHyperParams
    from tests.test_eps_pool import HP

    comps = build_tiny_pipeline(seed=0, words=["nurse", "man", "woman"])
    hp = EMCIDHyperParams.from_dict(dict(HP, layers=[2, 3]))
    H = comps.text_encoder.config.hidden_size
    inter = comps.text_encoder.config.intermediate_size
    rng = np.random.RandomState(0)
    covs = []
    for _ in hp.layers:
        A = rng.randn(64, inter).astype(np.float32)
        covs.append(A.T @ A / 64)
    reqs = [{"prompts": ["a photo of {}"], "source": "nurse", "dest": d,
             "seed_train": 0} for d in ("woman", "man")]
    zs = [rng.randn(1, H).astype(np.float32) for _ in reqs]
    factors = get_factors_repr(comps, hp, zs, reqs, covs, max_iter=3,
                               verbose=False)
    assert len(factors) == 2
    assert all(np.isfinite(f) and f >= 0 for f in factors)
    assert abs(sum(factors) - 1.0) < 1e-6


@pytest.mark.slow
def test_debias_apply_repr_fb_route(monkeypatch):
    """repr_fb=True routes through get_factors_repr (no scorer use)."""
    import emcid_tpu.engine.debias as dbz
    from emcid_tpu.hparams import EMCIDHyperParams
    from tests.test_eps_pool import HP

    comps = build_tiny_pipeline(seed=0, words=["nurse", "man", "woman"])
    hp = EMCIDHyperParams.from_dict(
        dict(HP, layers=[2, 3], v_num_grad_steps=2))
    called = {}

    def fake_repr(components, hparams, zs, reqs, covs, **kw):
        called["repr"] = True
        return [0.5] * len(reqs)

    monkeypatch.setattr(dbz, "get_factors_repr", fake_repr)
    reqs = [{"prompts": ["a photo of {}"], "source": "nurse",
             "dests": ["woman", "man"], "seed_train": 0}]
    edited, deltas, factors = dbz.apply_emcid_to_text_encoder_debias(
        comps, reqs, hp, scorer=None, repr_fb=True, max_iter=2,
        num_inference_steps=2, verbose=False)
    assert called.get("repr") and factors == [[0.5, 0.5]]
