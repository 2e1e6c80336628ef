"""Fused GroupNorm(+SiLU) Pallas kernels (ops/groupnorm.py).

Parity ladder: Pallas (interpret mode) == jnp reference == flax
nn.GroupNorm(+silu), forward and VJP, across the UNet's group geometries
(Cg = 2..40, including the non-power-of-two Cg=30 of SD's 960-channel
up-block concats); bf16 error bounded against an f64 oracle; and the
EMCID_TPU_FUSED_GN flag leaves the UNet's param tree and outputs intact.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from emcid_tpu.ops.groupnorm import (
    fits, gn_act_pallas, gn_act_reference, group_norm_act,
)

SHAPES = [
    # (shape, num_groups) — SD UNet geometries at test scale
    ((2, 16, 16, 320), 32),   # level-0 channels, Cg=10
    ((2, 8, 8, 960), 32),     # up-block concat, Cg=30 (non-pow2)
    ((3, 64, 64), 32),        # (B, S, C) flat form, Cg=2
    ((2, 4, 4, 64), 16),      # tiny-pipeline geometry
    ((1, 7, 9, 40), 8),       # odd spatial extents, Cg=5
]


def _inputs(shape, dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    kx, ks, kb = jax.random.split(k, 3)
    x = jax.random.normal(kx, shape, dtype) * 2.0 + 0.3
    C = shape[-1]
    scale = jax.random.normal(ks, (C,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(kb, (C,), jnp.float32) * 0.1
    return x, scale, bias


@pytest.mark.parametrize("shape,groups", SHAPES)
@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_matches_reference(shape, groups, act):
    x, scale, bias = _inputs(shape)
    got = gn_act_pallas(x, scale, bias, groups, 1e-5, act, True)
    want = gn_act_reference(x, scale, bias, num_groups=groups, eps=1e-5,
                            act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape,groups", SHAPES[:3])
@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_vjp_matches_reference(shape, groups, act):
    x, scale, bias = _inputs(shape, seed=1)
    w = jax.random.normal(jax.random.PRNGKey(9), shape)

    def loss_pallas(x, s, b):
        return jnp.sum(gn_act_pallas(x, s, b, groups, 1e-5, act, True) * w)

    def loss_ref(x, s, b):
        return jnp.sum(gn_act_reference(x, s, b, num_groups=groups,
                                        eps=1e-5, act=act) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, nm in zip(gp, gr, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=nm)


@pytest.mark.parametrize("act", ["none", "silu"])
def test_reference_matches_flax(act):
    """The jnp mirror == flax nn.GroupNorm(+silu) at f32 (the fused path's
    claimed semantics: contiguous groups, f32 stats, fast variance)."""
    shape, groups = (2, 8, 8, 64), 16
    x, scale, bias = _inputs(shape, seed=2)
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    y_flax = gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    if act == "silu":
        y_flax = jax.nn.silu(y_flax)
    y_ref = gn_act_reference(x, scale, bias, num_groups=groups, eps=1e-5,
                             act=act)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_flax),
                               atol=1e-5, rtol=1e-5)


def test_bf16_error_bounded():
    """bf16 fused output stays within bf16 rounding of the f64 oracle —
    the fused path normalizes in f32, never looser than flax-bf16."""
    shape, groups = (2, 16, 16, 320), 32
    x, scale, bias = _inputs(shape, seed=3)
    xb = x.astype(jnp.bfloat16)

    x64 = np.asarray(x, np.float64)
    B, C = shape[0], shape[-1]
    xg = x64.reshape(B, -1, groups, C // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xhat = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(B, -1, C)
    y64 = xhat * np.asarray(scale, np.float64) + np.asarray(bias, np.float64)
    y64 = (y64 / (1 + np.exp(-y64))).reshape(shape)

    got = np.asarray(
        gn_act_pallas(xb, scale, bias, groups, 1e-5, "silu", True),
        np.float64)
    # bf16 has ~2-3 decimal digits; the input cast alone costs ~1e-2 here
    assert np.max(np.abs(got - y64)) < 5e-2


def test_chunk_choices_conform_to_tpu_lowering():
    """Every chunk _pick_chunk returns is a 128-multiple or the full C —
    the TPU lowering rejects anything else (measured on-chip, PERF.md
    round 4; the CPU interpret mode accepts non-conforming blocks, which
    is how the original chunker shipped a crash)."""
    from emcid_tpu.ops.groupnorm import _pick_chunk

    for S in (256, 1024, 2304, 4096):
        for C in (320, 640, 960, 1280):
            for n_big in (2, 3):
                cc = _pick_chunk(S, C, 32, 2, n_big)
                if cc is not None:
                    assert cc == C or cc % 128 == 0, (S, C, n_big, cc)
    # train_res-384 product shapes (48^2 tokens): full-C fits both passes
    assert _pick_chunk(2304, 320, 32, 2, 2) == 320
    assert _pick_chunk(2304, 320, 32, 2, 3) == 320
    assert fits((24, 48, 48, 320), 32)
    # the on-chip crash shape (512-res level-0): the bwd has no conforming
    # chunk (custom-vjp backward takes _bwd_reference) but the fwd still
    # runs fused — fits() gates on the forward only
    assert _pick_chunk(4096, 320, 32, 2, 3) is None
    assert _pick_chunk(4096, 320, 32, 2, 2) == 320
    assert fits((24, 64, 64, 320), 32)
    # mid-res bwd picks the 128-multiple partial chunk
    assert _pick_chunk(1024, 1280, 32, 2, 3) == 640


def test_fits_rejects_oversized_slabs():
    # shapes whose FORWARD blocks exceed VMEM at any conforming chunk ->
    # whole-op XLA fallback (the pre-conformance chunker claimed these
    # fit and crashed the on-chip lowering)
    assert not fits((24, 128, 128, 320), 32)      # SDXL level-0
    assert not fits((1, 512, 512, 512), 32, 2)    # VAE-decoder scale
    assert not fits((2, 8, 8, 30), 4)             # C % G != 0
    # 512-res level-0: fwd fits (2 big blocks, 10.5 MB), bwd does not
    # (3 blocks, 15.7 MB) -> fused fwd + _bwd_reference backward
    assert fits((24, 64, 64, 320), 32)


def test_bwd_reference_fallback_parity(monkeypatch):
    """When the bwd kernel has no conforming chunk, the custom-vjp
    backward must produce the same gradients through _bwd_reference.

    Engineered at a tiny f32 shape by shrinking _BUDGET so the fwd's
    2-big-block chunking fits (64 KiB) but the bwd's 3-block one (96 KiB)
    does not — same fit split as the real (24, 4096, 320) bf16 case."""
    import emcid_tpu.ops.groupnorm as gnmod

    monkeypatch.setattr(gnmod, "_BUDGET", 80000)
    shape, groups = (2, 8, 8, 64), 16
    x, scale, bias = _inputs(shape, seed=11)
    assert gnmod.fits(shape, groups, x.dtype.itemsize)
    assert gnmod._pick_chunk(64, 64, groups, x.dtype.itemsize, 3) is None

    w = jax.random.normal(jax.random.PRNGKey(12), shape)

    def loss_pallas(x, s, b):
        return jnp.sum(gn_act_pallas(x, s, b, groups, 1e-5, "silu", True)
                       * w)

    def loss_ref(x, s, b):
        return jnp.sum(gn_act_reference(x, s, b, num_groups=groups,
                                        eps=1e-5, act="silu") * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, nm in zip(gp, gr, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=nm)


def test_dispatch_uses_reference_on_cpu():
    shape, groups = (2, 4, 4, 64), 16
    x, scale, bias = _inputs(shape, seed=4)
    got = group_norm_act(x, scale, bias, num_groups=groups, eps=1e-5,
                         act="silu")
    want = gn_act_reference(x, scale, bias, num_groups=groups, eps=1e-5,
                            act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


# ---------------------------------------------------------------------------
# UNet integration behind EMCID_TPU_FUSED_GN
# ---------------------------------------------------------------------------


def _tiny_unet():
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(seed=0, words=["w0", "w1"])
    return comps.unet, comps.unet_params


def _unet_inputs(unet, seed=0):
    cfg = unet.config
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    sample = jax.random.normal(
        k1, (2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ctx = jax.random.normal(k2, (2, 7, cfg.cross_attention_dim))
    t = jnp.array([3, 11], jnp.int32)
    return sample, t, ctx


def test_unet_fused_flag_parity(monkeypatch):
    unet, params = _tiny_unet()
    sample, t, ctx = _unet_inputs(unet)

    monkeypatch.delenv("EMCID_TPU_FUSED_GN", raising=False)
    base = unet.apply({"params": params}, sample, t, ctx).sample

    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "1")
    fused = unet.apply({"params": params}, sample, t, ctx).sample
    # same params consumed by both paths (tree identical by construction);
    # outputs agree to normalize-rounding
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-4, rtol=5e-4)


def test_geo_wins_frontier():
    """The per-geometry gate admits the measured 2.35x win class
    (large-token narrow-channel, e.g. 512/384-res level-0) and excludes
    every measured loss (PERF.md round-4/5 fused-GN A/B rows)."""
    from emcid_tpu.ops.groupnorm import geo_wins

    assert geo_wins((24, 64, 64, 320))     # 512-res level-0: 2.35x win
    assert geo_wins((24, 48, 48, 320))     # 384-res level-0 (A/B target)
    assert geo_wins((24, 64, 64, 640))     # level-0 up-concat width
    assert not geo_wins((24, 32, 32, 1280))  # measured 0.36x loss class
    assert not geo_wins((24, 16, 16, 1280))  # mid-block
    assert not geo_wins((2, 8, 8, 64))       # tiny grids


def test_unet_geo_mode_parity(monkeypatch):
    """EMCID_TPU_FUSED_GN=geo must produce the same UNet outputs as the
    stock path (on CPU every geo site routes through the jnp reference,
    so this pins dispatch correctness, not kernel numerics)."""
    unet, params = _tiny_unet()
    sample, t, ctx = _unet_inputs(unet)

    monkeypatch.delenv("EMCID_TPU_FUSED_GN", raising=False)
    base = unet.apply({"params": params}, sample, t, ctx).sample
    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "geo")
    geo = unet.apply({"params": params}, sample, t, ctx).sample
    np.testing.assert_allclose(np.asarray(geo), np.asarray(base),
                               atol=5e-4, rtol=5e-4)
    # unknown values fall back to off (exact equality with the stock path)
    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "banana")
    off = unet.apply({"params": params}, sample, t, ctx).sample
    np.testing.assert_array_equal(np.asarray(off), np.asarray(base))


@pytest.mark.slow
def test_unet_fused_flag_param_tree_identical(monkeypatch):
    """_GNParams is a byte-exact parameter twin of nn.GroupNorm: init
    under either flag yields the SAME leaves (paths, shapes, values)."""
    unet, _ = _tiny_unet()
    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "1")
    pf = unet.init_params(jax.random.PRNGKey(0))
    monkeypatch.delenv("EMCID_TPU_FUSED_GN")
    pb = unet.init_params(jax.random.PRNGKey(0))

    flat_f = jax.tree_util.tree_flatten_with_path(pf)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(pb)[0]
    assert ([jax.tree_util.keystr(p) for p, _ in flat_f]
            == [jax.tree_util.keystr(p) for p, _ in flat_b])
    for (path, lf), (_, lb) in zip(flat_f, flat_b):
        assert lf.shape == lb.shape and lf.dtype == lb.dtype, path
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(path))


def test_pallas_gn_under_checkpoint_names_policy():
    """The custom-vjp kernel composes with the level-0 selective remat
    (jax.checkpoint + save_anything_except_these_names) — the exact
    Stage-1 on-chip composition (engine/compute_z.py remat='level0')."""
    from jax.ad_checkpoint import checkpoint_name

    shape, groups = (2, 8, 8, 64), 16
    x, scale, bias = _inputs(shape, seed=7)
    w = jax.random.normal(jax.random.PRNGKey(3), shape)

    def net(x):
        h = gn_act_pallas(x, scale, bias, groups, 1e-5, "silu", True)
        h = checkpoint_name(h, "unet_interior")
        h = gn_act_pallas(h, scale, bias, groups, 1e-5, "none", True)
        return jnp.sum(h * w)

    policy = jax.checkpoint_policies.save_anything_except_these_names(
        "unet_interior")
    g_plain = jax.grad(net)(x)
    g_remat = jax.grad(jax.checkpoint(net, policy=policy))(x)
    np.testing.assert_allclose(np.asarray(g_remat), np.asarray(g_plain),
                               atol=1e-6, rtol=1e-6)


def test_trace_knobs_key_program_memos(monkeypatch):
    """Flipping a trace-time env knob mid-process must retrace, not reuse
    a stale executable (ADVICE round-3 _OPTZ_CACHE hazard class): every
    program memo folds runtime.trace_env_knobs() into its key."""
    from emcid_tpu.models import pipeline as P
    from emcid_tpu.models.loader import build_tiny_pipeline
    from emcid_tpu.runtime import trace_env_knobs

    monkeypatch.delenv("EMCID_TPU_FUSED_GN", raising=False)
    k0 = trace_env_knobs()
    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "1")
    assert trace_env_knobs() != k0

    comps = build_tiny_pipeline(seed=0, words=["w0", "w1"])
    s1 = P._get_sampler(comps.unet, comps.schedule, 2, "ddim", True)
    monkeypatch.delenv("EMCID_TPU_FUSED_GN")
    s2 = P._get_sampler(comps.unet, comps.schedule, 2, "ddim", True)
    assert s1 is not s2


@pytest.mark.slow
def test_unet_fused_grad_parity(monkeypatch):
    unet, params = _tiny_unet()
    sample, t, ctx = _unet_inputs(unet, seed=5)

    def loss(ctx, params):
        out = unet.apply({"params": params}, sample, t, ctx).sample
        return jnp.sum(out.astype(jnp.float32) ** 2)

    monkeypatch.delenv("EMCID_TPU_FUSED_GN", raising=False)
    g_base = jax.grad(loss)(ctx, params)
    monkeypatch.setenv("EMCID_TPU_FUSED_GN", "1")
    g_fused = jax.grad(loss)(ctx, params)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_base),
                               atol=5e-3, rtol=5e-3)
