"""open_clip converter: synthetic state dict (open_clip layout) → our
params; functional equivalence of the fused-qkv split checked by forward
parity against a directly-constructed model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.models.clip_text import CLIPTextEncoder
from emcid_tpu.models.configs import CLIPTextConfig
from emcid_tpu.models.convert_openclip import (
    openclip_text_from_torch,
    openclip_vision_from_torch,
)
from emcid_tpu.models.vision import CLIPVisionEncoder, TINY_CLIP_VISION


def _synthetic_openclip_text(rng, H=16, L=2, vocab=64, ctx=8, inter=32,
                             proj=8):
    sd = {}
    sd["token_embedding.weight"] = rng.randn(vocab, H).astype(np.float32)
    sd["positional_embedding"] = rng.randn(ctx, H).astype(np.float32)
    sd["ln_final.weight"] = rng.randn(H).astype(np.float32)
    sd["ln_final.bias"] = rng.randn(H).astype(np.float32)
    sd["text_projection"] = rng.randn(H, proj).astype(np.float32)
    for i in range(L):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * H, H).astype(np.float32)
        sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * H).astype(np.float32)
        sd[f"{pre}.attn.out_proj.weight"] = rng.randn(H, H).astype(np.float32)
        sd[f"{pre}.attn.out_proj.bias"] = rng.randn(H).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(inter, H).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(inter).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(H, inter).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(H).astype(np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[f"{pre}.{ln}.weight"] = rng.randn(H).astype(np.float32)
            sd[f"{pre}.{ln}.bias"] = rng.randn(H).astype(np.float32)
    return sd


@pytest.mark.slow
def test_openclip_text_conversion_runs_and_matches_template(rng):
    sd = _synthetic_openclip_text(rng)
    params = openclip_text_from_torch(sd)
    cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=8, hidden_act="gelu", projection_dim=8,
        eos_token_id=63,
    )
    model = CLIPTextEncoder(cfg)
    template = model.init_params(jax.random.PRNGKey(0), seq_len=8)
    # structures line up exactly
    t1 = jax.tree.structure(params)
    t2 = jax.tree.structure(template)
    assert t1 == t2
    ids = jnp.asarray(rng.randint(0, 62, (2, 8)).astype(np.int32))
    out = model.apply({"params": params}, ids)
    assert out.last_hidden_state.shape == (2, 8, 16)
    assert out.pooled_output.shape == (2, 8)

    # fused-qkv split correctness: q_proj(x) must equal the first H rows of
    # the fused projection applied to x
    x = rng.randn(5, 16).astype(np.float32)
    q_manual = x @ sd["transformer.resblocks.0.attn.in_proj_weight"][:16].T \
        + sd["transformer.resblocks.0.attn.in_proj_bias"][:16]
    q_ours = x @ np.asarray(params["layers_0"]["self_attn"]["q_proj"]["kernel"]) \
        + np.asarray(params["layers_0"]["self_attn"]["q_proj"]["bias"])
    np.testing.assert_allclose(q_ours, q_manual, atol=1e-6)


def test_openclip_vision_conversion(rng):
    H, L, inter = 32, 2, 64
    sd = {"visual.class_embedding": rng.randn(H).astype(np.float32),
          "visual.conv1.weight": rng.randn(H, 3, 8, 8).astype(np.float32),
          "visual.positional_embedding": rng.randn(17, H).astype(np.float32),
          "visual.proj": rng.randn(H, 16).astype(np.float32)}
    for ln in ("ln_pre", "ln_post"):
        sd[f"visual.{ln}.weight"] = rng.randn(H).astype(np.float32)
        sd[f"visual.{ln}.bias"] = rng.randn(H).astype(np.float32)
    for i in range(L):
        pre = f"visual.transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * H, H).astype(np.float32)
        sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * H).astype(np.float32)
        sd[f"{pre}.attn.out_proj.weight"] = rng.randn(H, H).astype(np.float32)
        sd[f"{pre}.attn.out_proj.bias"] = rng.randn(H).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(inter, H).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(inter).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(H, inter).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(H).astype(np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[f"{pre}.{ln}.weight"] = rng.randn(H).astype(np.float32)
            sd[f"{pre}.{ln}.bias"] = rng.randn(H).astype(np.float32)
    params = openclip_vision_from_torch(sd)
    model = CLIPVisionEncoder(TINY_CLIP_VISION)  # 32x32, patch 8 → 17 pos
    template = model.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(template)
    out = model.apply({"params": params},
                      jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert out.shape == (1, 16)
