"""Training-image sampler default: DPM-Solver++(2M) at ≤25 steps (PERF
lever 1a — half the diffusion cost of the reference's PNDM-50 protocol at
matched sample quality, models/scheduler.py DPM++ tests).  Guards: the
step-count resolution logic, and edit-efficacy parity pndm vs dpm++ on the
tiny pipeline."""

import dataclasses

import numpy as np
import pytest

from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from tests.test_eps_pool import HP


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog"])


def _captured_steps(comps, monkeypatch, **kwargs):
    """Run compute_zs_for_requests with a stubbed image generator; return
    the (num_inference_steps, sampler) it was asked for."""
    import emcid_tpu.engine.editor as editor

    hp = EMCIDHyperParams.from_dict(dict(HP, v_num_grad_steps=1))
    seen = {}

    def fake(components, block, hparams, **kw):
        seen["steps"] = kw["num_inference_steps"]
        seen["sampler"] = kw["sampler"]
        h = components.unet.config.sample_size
        C, P = len(block), len(block[0]["prompts"])
        return (np.zeros((C, 1, P, h, h, 4), np.float32),
                np.full((C, 1, P, h, h, 4), -6.0, np.float32))

    monkeypatch.setattr(editor, "training_latents_for_requests", fake)
    reqs = [{"prompts": ["a photo of {}"], "source": "cat", "dest": "dog",
             "seed_train": 0}]
    editor.compute_zs_for_requests(comps, reqs, hp, verbose=False, **kwargs)
    return seen


def test_dpm_default_caps_at_25(comps, monkeypatch):
    seen = _captured_steps(comps, monkeypatch, num_inference_steps=50)
    assert seen == {"steps": 25, "sampler": "dpm++"}


def test_dpm_default_never_raises_step_count(comps, monkeypatch):
    seen = _captured_steps(comps, monkeypatch, num_inference_steps=4)
    assert seen == {"steps": 4, "sampler": "dpm++"}


def test_pndm_reproduces_reference_protocol(comps, monkeypatch):
    seen = _captured_steps(comps, monkeypatch, num_inference_steps=50,
                           train_sampler="pndm")
    assert seen == {"steps": 50, "sampler": "pndm"}


def test_explicit_train_steps_wins(comps, monkeypatch):
    seen = _captured_steps(comps, monkeypatch, num_inference_steps=50,
                           train_sampler="dpm++", train_steps=20)
    assert seen == {"steps": 20, "sampler": "dpm++"}


@pytest.mark.slow
def test_edit_parity_pndm_vs_dpm(comps, tmp_path):
    """Efficacy guard: the same tiny edit trained on pndm- vs
    dpm++-generated images produces strongly aligned weight updates of
    comparable magnitude."""
    from emcid_tpu.engine.editor import apply_emcid
    from emcid_tpu.models.naming import get_weight

    hp = EMCIDHyperParams.from_dict(dict(HP, v_num_grad_steps=20))
    reqs = [{"prompts": ["a photo of {}", "{}"], "source": "cat",
             "dest": "dog", "seed_train": 1}]
    upds = {}
    for sampler in ("pndm", "dpm++"):
        edited, _ = apply_emcid(
            comps, reqs, hp, stats_dir=tmp_path / "stats",
            num_inference_steps=4, train_sampler=sampler, verbose=False)
        name = hp.rewrite_module_tmp.format(hp.layers[-1])
        upds[sampler] = (np.asarray(get_weight(edited.text_params, name))
                        - np.asarray(get_weight(comps.text_params, name)))
    a, b = upds["pndm"].ravel(), upds["dpm++"].ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.7, f"sampler changed the edit direction (cos={cos:.3f})"
    ratio = np.linalg.norm(b) / max(np.linalg.norm(a), 1e-9)
    assert 0.5 < ratio < 2.0
