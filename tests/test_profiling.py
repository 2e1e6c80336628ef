"""Config-driven FLOP model vs XLA cost_analysis (VERDICT r2 weak #5: the
old model hardcoded the SD-v1.4 calibration and scaled by spatial area only,
making SDXL/tiny MFU numbers fiction).

The structural walk counts attention UNPADDED and in full; XLA's
cost_analysis counts a `lax.scan`/pallas attention body once, so the
compiler's number is a LOWER bound that the analytic count must sit just
above (the gap ≈ the scanned/flash attention internals)."""

import jax
import jax.numpy as jnp
import pytest

from emcid_tpu.models.configs import sd_v14_unet, sdxl_unet, tiny_unet
from emcid_tpu.models.unet import UNet2DCondition
from emcid_tpu.profiling import (
    SD_V14_XLA_TFLOP_PER_IMAGE,
    stage1_step_flops,
    unet_fwd_flops,
)


def _xla_flops(cfg, batch, ctx_len):
    unet = UNet2DCondition(cfg)
    s = cfg.sample_size
    sample = jax.ShapeDtypeStruct((batch, s, s, cfg.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.int32)
    c = jax.ShapeDtypeStruct((batch, ctx_len, cfg.cross_attention_dim),
                             jnp.float32)
    params = jax.eval_shape(lambda r: unet.init_params(r),
                            jax.random.PRNGKey(0))

    def fwd(p, x, tt, cc):
        return unet.apply({"params": p}, x, tt, cc).sample

    ca = jax.jit(fwd).lower(params, sample, t, c).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def test_tiny_matches_cost_analysis():
    cfg = tiny_unet()
    mine = unet_fwd_flops(cfg, 2, context_len=16)
    xla = _xla_flops(cfg, 2, 16)
    # tiny attention is single-chunk on CPU → XLA counts ~everything
    assert 0.9 < mine / xla < 1.15, (mine, xla)


@pytest.mark.slow
def test_sd14_matches_cost_analysis():
    cfg = sd_v14_unet()
    mine = unet_fwd_flops(cfg, 1)
    xla = _xla_flops(cfg, 1, 77)
    # analytic ≥ xla; gap bounded by the scanned self-attention internals
    assert 1.0 < mine / xla < 1.30, (mine, xla)


def test_sd14_calibration_crosscheck():
    """The round-2 compiler calibration point (0.662 TFLOP/image) is the
    flash-blind lower bound; the structural count sits 15-25% above it
    (= the attention internals the pallas kernel hides from XLA)."""
    mine = unet_fwd_flops(sd_v14_unet(), 1) / 1e12
    assert 1.0 < mine / SD_V14_XLA_TFLOP_PER_IMAGE < 1.35


def test_config_sensitivity():
    """The count must follow the config, not just spatial area."""
    sd = unet_fwd_flops(sd_v14_unet(), 1)
    # SDXL at its native 128 latents: deep transformers + wide context.
    # Spatial-only scaling from SD would give 4×; the real ratio is ~8.5×.
    xl = unet_fwd_flops(sdxl_unet(), 1)
    assert 6.0 < xl / sd < 12.0
    # same config, same spatial size, wider context → more cross-attn work
    assert unet_fwd_flops(sd_v14_unet(), 1, context_len=154) > sd
    # tiny is ~4 orders below SD, not SD scaled by (8/64)^2 = 156×
    tiny = unet_fwd_flops(tiny_unet(), 1, context_len=16)
    assert tiny < sd / 5000
    # batch scales linearly
    assert unet_fwd_flops(sd_v14_unet(), 24) == pytest.approx(24 * sd)


def test_stage1_step_flops_modes():
    base = stage1_step_flops(None, 8, 3)                       # 3 fwd-equiv
    full = stage1_step_flops(None, 8, 3, remat="full")         # 4
    pooled = stage1_step_flops(None, 8, 3, eps_dest_pooled=True)  # 2
    per_fwd = unet_fwd_flops(None, 24)
    assert base == pytest.approx(3 * per_fwd)
    assert full == pytest.approx(4 * per_fwd)
    assert pooled == pytest.approx(2 * per_fwd)
