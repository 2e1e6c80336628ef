"""Step-time / MFU accounting for the hot paths.

Analytic FLOP counts (attention counted unpadded — achieved TFLOP/s is
therefore *useful* throughput; v5e bf16 peak is ~197 TFLOP/s) so that every
Stage-1 block and sampler run can report ms/step and model-FLOPs-utilization
without a profiler attached (the tunneled TPU cannot run xprof).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Optional

# bf16 peak of one v5e chip; override for other parts via env if needed
PEAK_TFLOPS = 197.0


# SD-v1.4 cross-check: XLA cost_analysis counts 15.89 TFLOP at B=24 →
# 0.662 TFLOP/image at 64×64 latents (round-2 calibration; the structural
# walk below lands within a few % of it — tests/test_profiling.py)
SD_V14_XLA_TFLOP_PER_IMAGE = 0.662


def _conv(cin: int, cout: int, hw: int, k: int = 3) -> float:
    return 2.0 * k * k * cin * cout * hw * hw


def _lin(n: int, cin: int, cout: int) -> float:
    return 2.0 * n * cin * cout


def _resnet(cin: int, cout: int, hw: int, temb_dim: int) -> float:
    f = _conv(cin, cout, hw) + _conv(cout, cout, hw) + 2.0 * temb_dim * cout
    if cin != cout:
        f += _conv(cin, cout, hw, k=1)  # conv_shortcut
    return f


def _transformer(c: int, hw: int, depth: int, ctx_len: int,
                 ctx_dim: int) -> float:
    """Transformer2D: proj in/out + depth × (self-attn, cross-attn, GEGLU
    FF).  Attention scores counted UNPADDED (useful FLOPs — the MXU pads
    head_dim to 128 lanes; see PERF.md)."""
    N = hw * hw
    f = 2.0 * _lin(N, c, c)  # proj_in + proj_out (1×1 conv ≡ linear)
    per = (
        4.0 * _lin(N, c, c) + 2.0 * 2.0 * N * N * c            # self
        + 2.0 * _lin(N, c, c) + 2.0 * _lin(ctx_len, ctx_dim, c)  # cross qo/kv
        + 2.0 * 2.0 * N * ctx_len * c                            # cross scores
        + _lin(N, c, 8 * c) + _lin(N, 4 * c, c)                  # GEGLU FF
    )
    return f + depth * per


def unet_fwd_flops(config, batch: int, latent_hw: Optional[int] = None,
                   context_len: int = 77) -> float:
    """Useful FLOPs of one UNet forward, walked structurally from the
    config (channel widths, block kinds, transformer depths, context dim) —
    mirrors the down/mid/up loop of models/unet.py exactly, so SDXL and
    tiny-test shapes are counted correctly, not spatial-scaled from an
    SD-v1.4 calibration point.  ``config=None`` assumes SD-v1.4.
    GroupNorm/SiLU/time-MLP elementwise work (<1%) is ignored."""
    if config is None:
        from emcid_tpu.models.configs import sd_v14_unet

        config = sd_v14_unet()
    s = latent_hw or config.sample_size
    ch = config.block_out_channels
    L = config.layers_per_block
    n_levels = len(ch)
    temb_dim = 4 * ch[0]
    ctx_dim = config.cross_attention_dim
    tdepth = config.transformer_layers_per_block

    f = _conv(config.in_channels, ch[0], s)  # conv_in
    skips = [ch[0]]
    hw = s
    cur = ch[0]
    for lvl, block_type in enumerate(config.down_block_types):
        out_ch = ch[lvl]
        has_attn = block_type == "CrossAttnDownBlock2D"
        for _ in range(L):
            f += _resnet(cur, out_ch, hw, temb_dim)
            cur = out_ch
            if has_attn:
                f += _transformer(out_ch, hw, tdepth[lvl], context_len,
                                  ctx_dim)
            skips.append(out_ch)
        if lvl < n_levels - 1:
            hw //= 2
            f += _conv(out_ch, out_ch, hw)  # strided downsample
            skips.append(out_ch)

    mid_ch = ch[-1]
    f += 2.0 * _resnet(mid_ch, mid_ch, hw, temb_dim)
    f += _transformer(mid_ch, hw, tdepth[-1], context_len, ctx_dim)

    rev_ch = list(reversed(ch))
    for lvl, block_type in enumerate(config.up_block_types):
        out_ch = rev_ch[lvl]
        has_attn = block_type == "CrossAttnUpBlock2D"
        for _ in range(L + 1):
            skip = skips.pop()
            f += _resnet(cur + skip, out_ch, hw, temb_dim)
            cur = out_ch
            if has_attn:
                f += _transformer(out_ch, hw, tdepth[n_levels - 1 - lvl],
                                  context_len, ctx_dim)
        if lvl < n_levels - 1:
            hw *= 2
            f += _conv(out_ch, out_ch, hw)  # post-upsample conv
    f += _conv(ch[0], config.out_channels, s)  # conv_out
    return f * batch


def stage1_step_flops(config, n_concepts: int, n_prompts: int,
                      latent_hw: Optional[int] = None, remat: str = "none",
                      eps_dest_pooled: bool = False) -> float:
    """Useful FLOPs of ONE Stage-1 optimization step for a concept block:
    eps_edit fwd + eps_dest fwd + backward (transpose ~= 1 fwd; +1 recompute
    fwd under remat='full'). Text-encoder work is <2% and ignored.
    ``eps_dest_pooled`` drops the per-step eps_dest forward (it is
    precomputed over a finite pool — engine.compute_z eps_dest_pool)."""
    B = n_concepts * n_prompts
    per_fwd = unet_fwd_flops(config, B, latent_hw)
    # "level0" recomputes only the full-resolution interiors (~0.15 fwd)
    fwd_equiv = {"full": 3.0, "level0": 2.15}.get(remat, 2.0)
    if not eps_dest_pooled:
        fwd_equiv += 1.0
    return per_fwd * fwd_equiv


@dataclass
class StepReport:
    seconds: float
    steps: int
    flops_per_step: float

    @property
    def ms_per_step(self) -> float:
        return self.seconds / max(self.steps, 1) * 1e3

    @property
    def tflops(self) -> float:
        return self.flops_per_step * self.steps / self.seconds / 1e12

    @property
    def mfu(self) -> float:
        return self.tflops / PEAK_TFLOPS

    def __str__(self) -> str:
        return (f"{self.ms_per_step:.0f} ms/step, "
                f"{self.tflops:.1f} TFLOP/s ({self.mfu * 100:.0f}% MFU)")
