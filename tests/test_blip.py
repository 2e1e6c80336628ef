"""Native BLIP ITM: parity against HF's torch BlipForImageTextRetrieval
(random weights — the scoring path the reference uses at
util/evaluate.py:189-248)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from emcid_tpu.models.blip import (
    TINY_BLIP_TEXT,
    TINY_BLIP_VISION,
    BlipITM,
    NativeBlipScorer,
    blip_from_torch,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        BlipConfig, BlipForImageTextRetrieval, BlipTextConfig,
        BlipVisionConfig,
    )

    cfg = BlipConfig(
        text_config=BlipTextConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, vocab_size=100, encoder_hidden_size=24,
        ).to_dict(),
        vision_config=BlipVisionConfig(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, image_size=32, patch_size=16,
        ).to_dict(),
    )
    torch.manual_seed(0)
    return BlipForImageTextRetrieval(cfg).eval()


def test_blip_itm_parity(hf_model):
    model = BlipITM(TINY_BLIP_VISION, TINY_BLIP_TEXT)
    params = blip_from_torch(hf_model.state_dict(), TINY_BLIP_VISION,
                             TINY_BLIP_TEXT)
    rng = np.random.RandomState(0)
    px = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    ids = rng.randint(1, 100, (2, 7)).astype(np.int32)
    mask = np.ones((2, 7), np.float32)
    mask[1, 5:] = 0.0

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).itm_score.numpy()
    out = np.asarray(model.apply({"params": params}, jnp.asarray(px),
                                 jnp.asarray(ids), jnp.asarray(mask)))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_native_scorer(hf_model):
    import dataclasses

    import jax

    from emcid_tpu.text import make_tiny_tokenizer

    tok = make_tiny_tokenizer(["a", "photo", "depicts", "cat", "dog"],
                              model_max_length=16)
    tcfg = dataclasses.replace(TINY_BLIP_TEXT, vocab_size=tok.vocab_size)
    model = BlipITM(TINY_BLIP_VISION, tcfg)
    params = model.init_params(jax.random.PRNGKey(0))
    scorer = NativeBlipScorer(model, params, tok)
    imgs = (np.random.RandomState(1).rand(2, 48, 48, 3) * 255).astype(
        np.uint8)
    s = scorer.itm_score(imgs, ["cat", "dog"])
    assert s.shape == (2,)
    assert np.all((0 <= s) & (s <= 1))
