"""Causal tracing: corruption/patching semantics + sweep harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.interp import (
    calculate_hidden_flow_text_encoder,
    collect_embedding_std,
    layername_text_encoder,
    trace_important_states,
    trace_with_patch_text_encoder,
)
from emcid_tpu.interp.causal_trace import corrupted_embeddings
from emcid_tpu.models.loader import build_tiny_pipeline

# the module fixture builds a pipeline + embedding sweeps (~20s setup on
# the 1-core host) — whole module rides the slow tier (r5 re-tiering)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(words=["cat", "dog", "photo"])


GEN = dict(num_inference_steps=2, height=16, width=16)


def test_layername_codec():
    assert layername_text_encoder(3) == "text_model.encoder.layers.3"
    assert layername_text_encoder(3, "mlp") == "text_model.encoder.layers.3.mlp"
    assert layername_text_encoder(0, "embed") == "text_model.embeddings"


def test_collect_embedding_std(comps):
    std = collect_embedding_std(comps, ["cat", "dog"])
    assert std > 0


def test_corruption_changes_only_row1(comps):
    ctx, tr = corrupted_embeddings(comps, "a photo of a cat", "cat", 0.5)
    clean, corrupt = np.asarray(ctx[0]), np.asarray(ctx[1])
    assert not np.allclose(clean, corrupt)
    # zero noise → identical rows
    ctx0, _ = corrupted_embeddings(comps, "a photo of a cat", "cat", 0.0)
    np.testing.assert_allclose(np.asarray(ctx0[0]), np.asarray(ctx0[1]),
                               atol=1e-6)


def test_full_patch_restores_clean(comps):
    """Patching ALL layers at ALL tokens must restore the clean states."""
    n_layers = comps.text_encoder.config.num_hidden_layers
    S = comps.tokenizer.model_max_length
    patch = {l: np.ones(S, np.float32) for l in range(n_layers)}
    ctx, _ = corrupted_embeddings(comps, "a photo of a cat", "cat", 0.5,
                                  patch_spec=patch)
    np.testing.assert_allclose(np.asarray(ctx[1]), np.asarray(ctx[0]),
                               atol=1e-5)


def test_trace_with_patch_generates_pair(comps):
    imgs = trace_with_patch_text_encoder(
        comps, "a photo of a cat", "cat", [(1, 4)], 0.5, seed=3,
        gen_kwargs=GEN,
    )
    assert imgs.shape == (2, 16, 16, 3)
    assert not np.array_equal(imgs[0], imgs[1])


def test_trace_important_states_heatmap(comps):
    calls = []

    def score_fn(img):
        calls.append(1)
        return float(np.asarray(img, np.float32).mean())

    heat = trace_important_states(
        comps, "a cat", "cat", 0.5, layers=[0, 1], tokens=[1, 2],
        score_fn=score_fn, gen_kwargs=GEN,
    )
    assert heat.shape == (2, 2)
    assert len(calls) == 4
    assert np.isfinite(heat).all()


def test_hidden_flow_bundle(comps):
    result = calculate_hidden_flow_text_encoder(
        comps, "a cat", "cat",
        score_fn=lambda img: float(np.asarray(img, np.float32).mean()),
        gen_kwargs=GEN, seed=1,
    )
    assert result["scores"].shape[0] == len(result["tokens"])
    assert result["subject_range"][1] <= len(result["tokens"])
    assert np.isfinite(result["clean_score"])
    assert result["noise_scale"] > 0
