"""CLIP text encoder: parity vs HF torch CLIPTextModel (random init, offline),
taps/injection/early-stop semantics, and torch-name weight addressing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.models import CLIPTextEncoder, CLIPTextConfig, TINY_TEXT
from emcid_tpu.models.convert_hf import clip_text_from_torch, clip_text_to_torch
from emcid_tpu.models.naming import get_weight, set_weight


@pytest.fixture(scope="module")
def tiny_model():
    model = CLIPTextEncoder(TINY_TEXT)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _ids(batch=2, seq=16, vocab=1024, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, vocab - 2, size=(batch, seq)).astype(np.int32)
    ids[:, -1] = TINY_TEXT.eos_token_id
    return jnp.asarray(ids)


def test_forward_shapes(tiny_model):
    model, params = tiny_model
    out = model.apply({"params": params}, _ids())
    assert out.last_hidden_state.shape == (2, 16, 32)
    assert out.pooled_output.shape == (2, 32)


def test_taps_shapes(tiny_model):
    model, params = tiny_model
    out = model.apply(
        {"params": params}, _ids(), capture=("fc2_in", "fc2_out", "layer_out")
    )
    assert out.taps["fc2_in"].shape == (2, 2, 16, 64)
    assert out.taps["fc2_out"].shape == (2, 2, 16, 32)
    assert out.taps["layer_out"].shape == (2, 2, 16, 32)


def test_stop_at_layer_truncates(tiny_model):
    model, params = tiny_model
    out = model.apply(
        {"params": params}, _ids(), stop_at_layer=0, capture=("fc2_in",)
    )
    assert out.taps["fc2_in"].shape[0] == 1  # only layer 0
    assert out.pooled_output is None
    # hidden equals full-run layer-0 output
    full = model.apply({"params": params}, _ids(), capture=("layer_out",))
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        np.asarray(full.taps["layer_out"][0]),
        atol=1e-5,
    )


def test_injection_changes_only_masked_tokens(tiny_model):
    model, params = tiny_model
    ids = _ids()
    base = model.apply({"params": params}, ids, capture=("layer_out",))
    delta = jnp.ones((2, 32), dtype=jnp.float32) * 0.5
    mask = jnp.zeros((2, 16)).at[:, 5].set(1.0)
    injected = model.apply(
        {"params": params},
        ids,
        inject_layer=0,
        inject_delta=delta,
        inject_mask=mask,
        capture=("layer_out",),
    )
    l0_base = np.asarray(base.taps["layer_out"][0])
    l0_inj = np.asarray(injected.taps["layer_out"][0])
    np.testing.assert_allclose(l0_inj[:, 5], l0_base[:, 5] + 0.5, atol=1e-5)
    np.testing.assert_allclose(l0_inj[:, :5], l0_base[:, :5], atol=1e-6)
    # downstream layers should differ (causally after token 5)
    assert not np.allclose(
        np.asarray(base.last_hidden_state[:, 6:]),
        np.asarray(injected.last_hidden_state[:, 6:]),
    )


def test_injection_gradient_flows(tiny_model):
    model, params = tiny_model
    ids = _ids()
    mask = jnp.zeros((2, 16)).at[:, 3].set(1.0)

    def loss(delta):
        out = model.apply(
            {"params": params}, ids, inject_layer=1,
            inject_delta=delta, inject_mask=mask,
        )
        return jnp.sum(out.last_hidden_state**2)

    g = jax.grad(loss)(jnp.zeros((2, 32)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_causality(tiny_model):
    """Changing a late token must not affect earlier positions (causal mask)."""
    model, params = tiny_model
    ids = np.asarray(_ids())
    ids2 = ids.copy()
    ids2[:, 10] = 7
    out1 = model.apply({"params": params}, jnp.asarray(ids))
    out2 = model.apply({"params": params}, jnp.asarray(ids2))
    np.testing.assert_allclose(
        np.asarray(out1.last_hidden_state[:, :10]),
        np.asarray(out2.last_hidden_state[:, :10]),
        atol=1e-5,
    )
    assert not np.allclose(
        np.asarray(out1.last_hidden_state[:, 10:]),
        np.asarray(out2.last_hidden_state[:, 10:]),
    )


def test_weight_addressing_by_torch_name(tiny_model):
    model, params = tiny_model
    w = get_weight(params, "text_model.encoder.layers.1.mlp.fc2")
    assert w.shape == (32, 64)  # (out, in) torch orientation
    new_w = jnp.zeros_like(w)
    params2 = set_weight(params, "text_model.encoder.layers.1.mlp.fc2", new_w)
    # original untouched (functional update)
    assert np.abs(np.asarray(get_weight(params, "text_model.encoder.layers.1.mlp.fc2"))).sum() > 0
    assert np.abs(np.asarray(get_weight(params2, "text_model.encoder.layers.1.mlp.fc2"))).sum() == 0
    # zeroing fc2 of layer 1 changes the output
    out1 = model.apply({"params": params}, _ids())
    out2 = model.apply({"params": params2}, _ids())
    assert not np.allclose(
        np.asarray(out1.last_hidden_state), np.asarray(out2.last_hidden_state)
    )


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_parity_vs_hf_torch(act):
    """Convert a randomly-initialized HF CLIPTextModel's weights and compare
    final hidden states + pooled output within fp32 tolerance."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99,
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act=act,
        eos_token_id=98,
        bos_token_id=97,
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act=act,
        eos_token_id=98,
    )
    params = clip_text_from_torch(hf_model.state_dict())
    model = CLIPTextEncoder(cfg)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 97, size=(2, 16)).astype(np.int64)
    ids[0, 10] = 98  # EOS mid-sequence to exercise pooling
    ids[1, 14] = 98

    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids))
    out = model.apply({"params": params}, jnp.asarray(ids.astype(np.int32)))

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        hf_out.last_hidden_state.numpy(),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.pooled_output), hf_out.pooler_output.numpy(), atol=2e-5
    )


def test_torch_roundtrip_export():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=50, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=8, eos_token_id=49, bos_token_id=48,
    )
    hf_model = transformers.CLIPTextModel(hf_cfg)
    params = clip_text_from_torch(hf_model.state_dict())
    sd = clip_text_to_torch(params)
    orig = {k: v.numpy() for k, v in hf_model.state_dict().items()
            if "position_ids" not in k}
    assert set(sd) == set(orig)
    for k in orig:
        np.testing.assert_allclose(sd[k], orig[k], atol=0)
