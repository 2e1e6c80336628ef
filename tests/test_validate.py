"""Parity-harness mechanics: self-goldens certify, perturbations fail."""

import numpy as np
import pytest

from emcid_tpu.cli.validate import (
    make_self_goldens,
    validate_against_goldens,
)
from emcid_tpu.models.loader import build_tiny_pipeline


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline()


def test_self_goldens_roundtrip(comps, tmp_path):
    p = tmp_path / "goldens.npz"
    make_self_goldens(comps, p, num_pndm_steps=4)
    errs = validate_against_goldens(comps, p, rtol=1e-5, atol=1e-5,
                                    verbose=False)
    assert set(errs) == {"text_hidden", "text_pooled", "unet_eps",
                         "vae_decode", "vae_enc_mean", "vae_enc_logvar",
                         "pndm_traj"}


def test_validation_catches_wrong_weights(comps, tmp_path):
    p = tmp_path / "goldens.npz"
    make_self_goldens(comps, p, num_pndm_steps=4)
    other = build_tiny_pipeline(seed=1)
    with pytest.raises(AssertionError):
        validate_against_goldens(other, p, rtol=1e-5, atol=1e-5,
                                 verbose=False)


def test_validation_catches_scheduler_drift(comps, tmp_path):
    import dataclasses

    from emcid_tpu.models.scheduler import Schedule

    p = tmp_path / "goldens.npz"
    make_self_goldens(comps, p, num_pndm_steps=4)
    wrong = dataclasses.replace(
        comps, schedule=Schedule.scaled_linear(beta_end=0.02))
    with pytest.raises(AssertionError, match="pndm_traj"):
        validate_against_goldens(wrong, p, rtol=1e-5, atol=1e-5,
                                 verbose=False)
