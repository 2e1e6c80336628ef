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


def test_validate_openclip_mechanics(tmp_path):
    """Plumbing check: a synthetic open_clip state dict + goldens produced
    from the converted model certify; perturbed goldens fail.  (Real-
    checkpoint certification = scripts/make_goldens_openclip.py, documented
    there.)"""
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")

    from emcid_tpu.cli.validate import validate_openclip
    from emcid_tpu.models.clip_text import CLIPTextEncoder
    from emcid_tpu.models.configs import CLIPTextConfig
    from emcid_tpu.models.convert_openclip import openclip_text_from_torch
    from tests.test_openclip_convert import _synthetic_openclip_text

    rng = np.random.RandomState(0)
    H, ctx, vocab = 64, 8, 64
    sd = _synthetic_openclip_text(rng, H=H, L=2, vocab=vocab, ctx=ctx,
                                  inter=128, proj=16)
    ckpt = tmp_path / "oc.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    cfg = CLIPTextConfig(vocab_size=vocab, hidden_size=H,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=1, max_position_embeddings=ctx,
                         hidden_act="gelu", projection_dim=16,
                         eos_token_id=vocab - 1)
    model = CLIPTextEncoder(cfg)
    params = openclip_text_from_torch(sd)
    ids = np.zeros((2, ctx), np.int64)
    ids[:, 0] = 1
    ids[0, 1:4] = [5, 6, vocab - 1]
    ids[1, 1:4] = [7, 8, vocab - 1]
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    g = tmp_path / "goldens.npz"
    np.savez(g, input_ids=ids,
             pixel_values=np.zeros((2, 4, 4, 3), np.float32),
             text_embeds=np.asarray(out.pooled_output),
             image_embeds=np.zeros((2, 16), np.float32),
             context_length=np.asarray(ctx), image_size=np.asarray(4))
    errs = validate_openclip(ckpt, g, verbose=False)
    assert errs["text_embeds"] < 1e-4
    bad = dict(np.load(g))
    bad["text_embeds"] = bad["text_embeds"] + 1.0
    g2 = tmp_path / "bad.npz"
    np.savez(g2, **bad)
    with pytest.raises(AssertionError):
        validate_openclip(ckpt, g2, verbose=False)
