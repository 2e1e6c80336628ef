"""Hparams dataclasses + name codec: load the reference-shipped JSON schema
and verify the codec strings (reference emcid_hparams.py:125-152)."""

import json

from emcid_tpu.hparams import (
    EMCIDHyperParams,
    EMCIDXLHyperParams,
    get_accum_time_blocks,
    load_hparams,
)

# Same schema as the shipped hparams/dest_s-200_c-1.5_ly-7-11_... file.
SD_HPARAMS = {
    "layers": [7, 8, 9, 10],
    "clamp_norm_factor": 1.5,
    "layer_selection": "all",
    "fact_token": "subject_last",
    "v_num_grad_steps": 100,
    "v_lr": 0.2,
    "v_weight_decay": 5e-4,
    "mom2_adjustment": True,
    "mom2_update_weight": 10000,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered",
    "mom2_n_samples": 100000,
    "mom2_dtype": "float32",
    "objective": "ablate-dest",
    "esd_mu": "None",
    "cal_text_repr_loss": True,
    "text_repr_loss_scale_factor": 0.01,
}


def test_from_dict_and_defaults():
    hp = EMCIDHyperParams.from_dict(SD_HPARAMS)
    assert hp.layers == [7, 8, 9, 10]
    assert hp.edit_weight == 0.5  # default
    assert hp.num_edit_tokens == 1
    assert hp.mom2_update_weight == 10000


def test_name_codec_dest():
    hp = EMCIDHyperParams.from_dict(SD_HPARAMS)
    name = EMCIDHyperParams.get_name(hp)
    # ly- encodes len(layers) (quirk kept from reference)
    assert name == "dest_s-100_c-1.5_ly-4_lr-0.2_wd-5e-04_txt-align-0.01"


def test_name_codec_esd_and_source():
    d = dict(SD_HPARAMS, objective="esd", esd_mu=1, cal_text_repr_loss=False)
    hp = EMCIDHyperParams.from_dict(d)
    assert EMCIDHyperParams.get_name(hp).startswith("esd-1_s-100")
    d = dict(SD_HPARAMS, objective="ablate-source", cal_text_repr_loss=False)
    hp = EMCIDHyperParams.from_dict(d)
    assert EMCIDHyperParams.get_name(hp) == "source_s-100_c-1.5_ly-4_lr-0.2_wd-5e-04"


def test_json_roundtrip(tmp_path):
    hp = EMCIDHyperParams.from_dict(SD_HPARAMS)
    p = tmp_path / "hp.json"
    with open(p, "w") as f:
        json.dump(hp.to_dict(), f)
    hp2 = EMCIDHyperParams.from_json(p)
    assert hp2 == hp


def test_load_hparams_dispatch(tmp_path):
    xl = dict(
        SD_HPARAMS,
        layers_2=[26, 27],
        mom2_update_weight_2=2000,
    )
    p = tmp_path / "sdxl-dest_test.json"
    with open(p, "w") as f:
        json.dump(xl, f)
    hp = load_hparams(str(p))
    assert isinstance(hp, EMCIDXLHyperParams)
    assert hp.layers_2 == [26, 27]
    name = EMCIDXLHyperParams.get_name(hp)
    assert name.startswith("sdxl-dest_s-100")


def test_accum_time_blocks():
    blocks = get_accum_time_blocks(50, True, 1000)
    assert blocks[0] == 20 and blocks[-1] == 1000 and len(blocks) == 50
