"""Config-matrix smoke (VERDICT r3 #8): every shipped reference hparams
JSON (hparams/*.json, 10 files) runs through a tiny end-to-end edit via the
product path — so a config-specific wiring gap (the class EWC fell into in
round 2) cannot survive unexercised.  Layers/grad-steps are shrunk to the
tiny models; every other flag (objective, use_ewc, txt-align, uce hybrid,
no_noise_loss, true_noise_loss, multi-layer spread) stays as shipped."""

import dataclasses
import glob

import numpy as np
import pytest

from emcid_tpu.hparams import (
    EMCIDHyperParams,
    EMCIDXLHyperParams,
    load_hparams,
)
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.naming import get_weight

REF_HPARAMS = "/root/reference/hparams"
ALL_SHIPPED = sorted(
    p.rsplit("/", 1)[-1][:-5] for p in glob.glob(f"{REF_HPARAMS}/*.json"))
SD_SHIPPED = [n for n in ALL_SHIPPED if not n.startswith("sdxl")]
XL_SHIPPED = [n for n in ALL_SHIPPED if n.startswith("sdxl")]

REQS = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
         "seed_train": 0}]

# shipped files whose names the codec (ours AND the reference's) does not
# emit — verified by running the reference get_name rules over the JSONs
HAND_NAMED = {
    "dest_s-200_c-1.5_ly-11_lr-0.1_ewc-1e7_txt-align-0.01",
    "dest_s-200_c-1.5_ly-11_lr-0.2_ewc-1e7_txt-align-0.01",
    "dest_s-200_c-1.5_ly-11_lr-0.2_wd-5e-04_txt-align-0.01_no_noise_loss",
    "dest_s-200_c-1.5_ly-11_lr-0.2_wd-5e-04_txt-align-0.01_uce",
    "dest_s-200_c-1.5_ly-7-11_lr-0.2_wd-5e-04_txt-align-0.01",
    "dest_s-300_c-1.5_ly-11_lr-0.2_wd-5e-04_true_noise_loss",
    "sdxl-dest_s-100_c-1.2_ly-8-11_ly2-26-31_lr-0.1_wd-8e-03_txt-align-0.01",
}


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog"])


def test_shipped_inventory_complete():
    # the reference ships 10 configs; a new file showing up must land here
    assert len(ALL_SHIPPED) == 10
    assert len(XL_SHIPPED) == 1


@pytest.mark.slow
@pytest.mark.parametrize("name", SD_SHIPPED)
def test_sd_hparams_end_to_end(comps, name, tmp_path, monkeypatch):
    monkeypatch.setenv("EMCID_TPU_FIM_PAIRS", "2")
    from emcid_tpu.engine.editor import apply_emcid

    hp = load_hparams(name, hparams_dir=REF_HPARAMS)
    assert isinstance(hp, EMCIDHyperParams)
    # the name codec reproduces codec-generated filenames; 6 shipped SD
    # files are hand-named in ways the REFERENCE's own get_name
    # (emcid_hparams.py:125-152) also would not emit (ewc-1e7 / ly-7-11 /
    # _no_noise_loss / _uce / _true_noise_loss suffixes — and the ly-7-11
    # file even says s-200 while its JSON holds v_num_grad_steps=100)
    if name not in HAND_NAMED:
        assert EMCIDHyperParams.get_name(hp) == name
    n = comps.text_encoder.config.num_hidden_layers
    n_layers = min(len(hp.layers), 2)  # keep multi-layer spread for ly-7-11
    tiny = dataclasses.replace(
        hp, layers=list(range(n - 1 - n_layers, n - 1)), v_num_grad_steps=2)
    edited, deltas = apply_emcid(
        comps, REQS, tiny, stats_dir=tmp_path / "stats",
        fim_dir=tmp_path / "fim", num_inference_steps=2, verbose=False)
    for layer in tiny.layers:
        wname = tiny.rewrite_module_tmp.format(layer)
        new = np.asarray(get_weight(edited.text_params, wname))
        old = np.asarray(get_weight(comps.text_params, wname))
        assert np.all(np.isfinite(new))
        assert not np.allclose(new, old), f"{name}: layer {layer} unchanged"
    if tiny.use_ewc:
        assert list((tmp_path / "fim").rglob("*.npz"))
    if getattr(tiny, "add_uce_edit", False):
        # the uce-hybrid leg must also have touched cross-attn projections
        from emcid_tpu.engine.uce import get_unet_weight
        from emcid_tpu.models.unet import cross_attn_kv_layer_names

        kv = cross_attn_kv_layer_names(comps.unet.config)
        changed = sum(
            not np.allclose(
                np.asarray(get_unet_weight(edited.unet_params, k)),
                np.asarray(get_unet_weight(comps.unet_params, k)))
            for k in kv)
        assert changed > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", XL_SHIPPED)
def test_sdxl_hparams_end_to_end(name, tmp_path):
    from emcid_tpu.engine.sdxl import apply_emcid_to_sdxl_text_encoders
    from emcid_tpu.models.sdxl import build_tiny_sdxl_pipeline

    hp = load_hparams(name, hparams_dir=REF_HPARAMS)
    assert isinstance(hp, EMCIDXLHyperParams)
    assert name in HAND_NAMED  # sdxl file is hand-named too
    comps = build_tiny_sdxl_pipeline(words=["cat", "dog"])
    tiny = dataclasses.replace(hp, layers=[0, 1], layers_2=[1, 2],
                               v_num_grad_steps=2)
    rng = np.random.RandomState(0)
    mean = rng.randn(1, 1, 1, 8, 8, 4).astype(np.float32) * 0.13
    logvar = np.full(mean.shape, -6.0, np.float32)
    inter = comps.text_encoder.config.intermediate_size
    covs = lambda n: [
        (lambda A: A.T @ A / 100)(rng.randn(100, inter).astype(np.float32))
        for _ in range(n)
    ]
    d1, d2, edited = apply_emcid_to_sdxl_text_encoders(
        comps, REQS, tiny, mean, logvar, covs(2), covs(2),
        height=16, width=16, verbose=False)
    for layer in tiny.layers:
        wname = tiny.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params, wname)),
            np.asarray(get_weight(comps.text_params, wname)))
    for layer in tiny.layers_2:
        wname = tiny.rewrite_module_tmp.format(layer)
        assert not np.allclose(
            np.asarray(get_weight(edited.text_params_2, wname)),
            np.asarray(get_weight(comps.text_params_2, wname)))
