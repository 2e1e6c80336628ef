"""Iterative UCE debias loop (reference uce_train.py:597-843 rebuild)."""

import numpy as np
import pytest

import jax

from emcid_tpu.engine.uce import (
    debias_ratios,
    edit_model_debias,
    get_unet_weight,
)
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.unet import cross_attn_kv_layer_names


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["doctor", "male", "female", "nurse"])


class ScriptedScorer:
    """Returns scripted per-image class logits: iteration k of the loop reads
    ratio ``script[min(k, len-1)]`` (images' content is irrelevant — the loop
    under test is the ratio-feedback controller, not CLIP)."""

    def __init__(self, script):
        self.script = [np.asarray(s, np.float64) for s in script]
        self.calls = 0

    def logits_per_image(self, images, texts):
        ratio = self.script[min(self.calls, len(self.script) - 1)]
        self.calls += 1
        n = len(images)
        winners = (np.arange(n) < round(ratio[0] * n)).astype(int)
        logits = np.zeros((n, len(texts)))
        logits[winners == 1, 0] = 1.0  # argmax -> class 0
        logits[winners == 0, 1] = 1.0  # argmax -> class 1
        return logits


GK = dict(num_inference_steps=2, height=16, width=16)


def test_debias_ratios_measures_and_bypasses(comps):
    scorer = ScriptedScorer([[0.75, 0.25]])
    ratios = debias_ratios(comps, scorer, ["doctor"], [["male", "female"]],
                           num_samples=4, num_seeds=1, gen_kwargs=GK)
    np.testing.assert_allclose(ratios[0], [0.75, 0.25])
    # bypass: previous diff below the gap -> previous ratio returned, no calls
    calls_before = scorer.calls
    ratios2 = debias_ratios(comps, scorer, ["doctor"], [["male", "female"]],
                            prev_ratio=ratios, ratio_diff=[0.01],
                            max_ratio_gap=0.05,
                            num_samples=4, num_seeds=1, gen_kwargs=GK)
    assert scorer.calls == calls_before
    np.testing.assert_allclose(ratios2[0], ratios[0])


def test_debias_uniform_ratio_is_a_no_op(comps):
    """Already-balanced concept: the loop stops before editing anything."""
    scorer = ScriptedScorer([[0.5, 0.5]])
    edited, weights, init_r, final_r = edit_model_debias(
        comps, scorer, ["doctor"], [["male", "female"]],
        max_iters=3, num_samples=4, num_seeds=1, gen_kwargs=GK,
        verbose=False)
    assert edited.unet_params is comps.unet_params
    np.testing.assert_allclose(final_r[0], [0.5, 0.5])


@pytest.mark.slow
def test_debias_loop_edits_until_converged(comps):
    """Biased readings trigger K/V edits; the scripted ratio then converges
    and the loop stops with changed projections."""
    scorer = ScriptedScorer([[1.0, 0.0], [0.8, 0.2], [0.5, 0.5]])
    edited, weights, init_r, final_r = edit_model_debias(
        comps, scorer, ["doctor"], [["male", "female"]],
        max_iters=5, num_samples=10, num_seeds=1, gen_kwargs=GK,
        verbose=False)
    np.testing.assert_allclose(init_r[0], [1.0, 0.0])
    np.testing.assert_allclose(final_r[0], [0.5, 0.5])
    assert scorer.calls == 3
    kv = [n for n in cross_attn_kv_layer_names(comps.unet.config)
          if n.endswith(".to_v")]
    w_old = np.asarray(get_unet_weight(comps.unet_params, kv[0]))
    w_new = np.asarray(get_unet_weight(edited.unet_params, kv[0]))
    assert not np.allclose(w_old, w_new)
    # weights move toward balancing class 1 up, class 0 down
    assert weights[0][0] < 0 < weights[0][1]
    # caller's components untouched (functional restore contract)
    np.testing.assert_array_equal(
        np.asarray(get_unet_weight(comps.unet_params, kv[0])), w_old)


def test_debias_zero_weight_edit_is_identity(comps):
    """With zero class weights the closed-form solve has the current W as
    its exact fixed point (v = W c on every context row)."""
    # force one edit round with an (artificial) biased reading whose
    # weights are zeroed by the max_change gate: max_change below diff
    # cannot happen with nonzero bias, so instead check algebraically via
    # a converged-then-biased script: run one edit with tiny weight_step
    scorer = ScriptedScorer([[1.0, 0.0], [0.5, 0.5]])
    edited, *_ = edit_model_debias(
        comps, scorer, ["doctor"], [["male", "female"]],
        max_iters=2, weight_step=0.0,  # zero weights -> fixed point
        num_samples=4, num_seeds=1, gen_kwargs=GK, verbose=False)
    kv = [n for n in cross_attn_kv_layer_names(comps.unet.config)
          if n.endswith(".to_v") or n.endswith(".to_k")]
    for n in kv:
        np.testing.assert_allclose(
            np.asarray(get_unet_weight(edited.unet_params, n)),
            np.asarray(get_unet_weight(comps.unet_params, n)),
            rtol=5e-3, atol=5e-4)
