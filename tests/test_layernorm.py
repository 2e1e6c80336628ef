"""Fused LayerNorm Pallas kernels (ops/layernorm.py) — same parity ladder
as tests/test_groupnorm.py: Pallas(interpret) == jnp reference == flax
nn.LayerNorm, fwd + VJP; remat-names composition; UNet flag integration
(EMCID_TPU_FUSED_LN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from emcid_tpu.ops.layernorm import (
    fits, layer_norm_act, ln_act_pallas, ln_act_reference,
)

SHAPES = [
    (2, 16, 320),    # transformer tokens at level-0 channels
    (2, 64, 64),     # tiny-pipeline geometry
    (1, 7, 40),      # odd row counts (R must divide S=7)
    (3, 12, 8, 16),  # 4-D input (flattened internally)
]


def _inputs(shape, dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    kx, ks, kb = jax.random.split(k, 3)
    x = jax.random.normal(kx, shape, dtype) * 1.5 - 0.2
    C = shape[-1]
    scale = jax.random.normal(ks, (C,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(kb, (C,), jnp.float32) * 0.1
    return x, scale, bias


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_matches_reference(shape, act):
    x, scale, bias = _inputs(shape)
    got = ln_act_pallas(x, scale, bias, 1e-6, act, True)
    want = ln_act_reference(x, scale, bias, eps=1e-6, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:2])
@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_vjp_matches_reference(shape, act):
    x, scale, bias = _inputs(shape, seed=1)
    w = jax.random.normal(jax.random.PRNGKey(9), shape)

    def loss_pallas(x, s, b):
        return jnp.sum(ln_act_pallas(x, s, b, 1e-6, act, True) * w)

    def loss_ref(x, s, b):
        return jnp.sum(ln_act_reference(x, s, b, eps=1e-6, act=act) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, nm in zip(gp, gr, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=nm)


def test_reference_matches_flax():
    shape = (2, 16, 64)
    x, scale, bias = _inputs(shape, seed=2)
    y_flax = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    y_ref = ln_act_reference(x, scale, bias, eps=1e-6)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_flax),
                               atol=1e-5, rtol=1e-5)


def test_pallas_ln_under_checkpoint_names_policy():
    from jax.ad_checkpoint import checkpoint_name

    shape = (2, 16, 64)
    x, scale, bias = _inputs(shape, seed=7)
    w = jax.random.normal(jax.random.PRNGKey(3), shape)

    def net(x):
        h = ln_act_pallas(x, scale, bias, 1e-6, "none", True)
        h = checkpoint_name(h, "unet_interior")
        h = ln_act_pallas(h, scale, bias, 1e-6, "silu", True)
        return jnp.sum(h * w)

    policy = jax.checkpoint_policies.save_anything_except_these_names(
        "unet_interior")
    g_plain = jax.grad(net)(x)
    g_remat = jax.grad(jax.checkpoint(net, policy=policy))(x)
    np.testing.assert_allclose(np.asarray(g_remat), np.asarray(g_plain),
                               atol=1e-6, rtol=1e-6)


def test_dispatch_uses_reference_on_cpu():
    shape = (2, 8, 64)
    x, scale, bias = _inputs(shape, seed=4)
    got = layer_norm_act(x, scale, bias, eps=1e-6, act="none")
    want = ln_act_reference(x, scale, bias, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_row_choices_conform_to_tpu_lowering():
    """Row chunks must be 8-sublane multiples or the full S — the TPU
    lowering rejects anything else (measured on-chip, PERF.md round 4);
    the bwd dgamma/dbeta partials moved to (B, 1, C) for the same
    reason (a (1, C) block of a (B, C) array has a 1-sublane leading
    dim)."""
    from emcid_tpu.ops.layernorm import _pick_rows

    for S in (77, 256, 1024, 2304, 4096):
        for C in (320, 640, 1280):
            for n_big in (2, 3):
                r = _pick_rows(S, C, 2, n_big)
                if r is not None:
                    assert r % 8 == 0 or r == S, (S, C, n_big, r)
    assert _pick_rows(4096, 320, 2, 3) % 8 == 0  # on-chip failure shape
    assert _pick_rows(77, 320, 2, 2) == 77       # odd S: whole-S block


def test_fits():
    assert fits((24, 4096, 320))
    assert fits((24, 16384, 320))        # SDXL level-0 tokens
    assert not fits((1, 8, 4 * 1024 * 1024))  # C too wide for any row chunk


# --- UNet integration behind EMCID_TPU_FUSED_LN ---------------------------


def _tiny_unet():
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(seed=0, words=["w0", "w1"])
    return comps.unet, comps.unet_params


def test_unet_fused_ln_parity(monkeypatch):
    unet, params = _tiny_unet()
    cfg = unet.config
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sample = jax.random.normal(
        k1, (2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ctx = jax.random.normal(k2, (2, 7, cfg.cross_attention_dim))
    t = jnp.array([3, 11], jnp.int32)

    monkeypatch.delenv("EMCID_TPU_FUSED_LN", raising=False)
    base = unet.apply({"params": params}, sample, t, ctx).sample

    monkeypatch.setenv("EMCID_TPU_FUSED_LN", "1")
    fused = unet.apply({"params": params}, sample, t, ctx).sample
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-4, rtol=5e-4)


def test_unet_fused_ln_param_tree_identical(monkeypatch):
    unet, _ = _tiny_unet()
    monkeypatch.setenv("EMCID_TPU_FUSED_LN", "1")
    pf = unet.init_params(jax.random.PRNGKey(0))
    monkeypatch.delenv("EMCID_TPU_FUSED_LN")
    pb = unet.init_params(jax.random.PRNGKey(0))
    flat_f = jax.tree_util.tree_flatten_with_path(pf)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(pb)[0]
    assert ([jax.tree_util.keystr(p) for p, _ in flat_f]
            == [jax.tree_util.keystr(p) for p, _ in flat_b])
    for (path, lf), (_, lb) in zip(flat_f, flat_b):
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(path))
