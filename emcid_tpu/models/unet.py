"""SD-style conditional UNet (UNet2DConditionModel equivalent) in Flax.

Built tpu-first rather than ported: NHWC layout throughout (TPU conv
layout), static shapes, bf16-friendly compute with f32 softmax/normalization,
and two functional instrumentation seams replacing torch hooks:

* **capture** — edit-relevant activations are exposed via ``self.sow`` into
  the ``intermediates`` collection (cross-attn K/V inputs/outputs, ff.net.2
  and conv2 inputs/outputs).  Callers opt in with
  ``mutable=["intermediates"]``; otherwise sow is free.  This serves the
  cross-attn covariance sweep (reference layer_stats.py:333-427) and the
  UNet-edit key extraction (reference compute_ks.py:157-328).
* **injection** — an optional ``inject`` dict maps HF-style module paths
  (e.g. ``"up_blocks.3.attentions.2.transformer_blocks.0.attn2"``) to
  additive deltas applied at that module's output; the Stage-1 UNet delta
  optimization (reference compute_delta_unet, compute_z.py:1778-1988)
  differentiates through these entries.

Module naming mirrors HF (``down_blocks_0/attentions_1/transformer_blocks_0/
attn2/to_k``) so weight conversion is mechanical and the reference's
editing-layer name templates (globals.yml UNET_EDIT_TEMPLATES,
hparams rewrite_module_tmp dicts) resolve directly.

HF quirk kept: ``attention_head_dim`` in SD configs is the number of heads
(320/8 = 40-dim heads for SD1.x), not the head dim.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emcid_tpu.models.configs import UNetConfig


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep features (B,) → (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _inject_out(inject: Optional[Dict[str, jnp.ndarray]], name: str,
                value: jnp.ndarray) -> jnp.ndarray:
    if inject is not None and name in inject:
        return value + inject[name].astype(value.dtype)
    return value


def _tag(x: jnp.ndarray, on: bool) -> jnp.ndarray:
    """Selective-remat seam: mark ``x`` with ``checkpoint_name`` so a
    names-based ``jax.checkpoint`` policy (``save_anything_except_these_names
    ("unet_interior")``) recomputes it in the backward instead of storing it.
    A plain identity when ``on`` is False — the default jaxpr (and thus every
    compiled-program cache key) is unchanged unless a caller opts in via
    ``remat_tag_hw``."""
    if not on:
        return x
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "unet_interior")


def _fused_gn() -> str:
    """Opt-in for the fused GroupNorm(+SiLU) Pallas path (ops/groupnorm.py).
    Read at trace time; default "0" (off) — the stock nn.GroupNorm lowering
    stays byte-identical until the on-chip A/B justifies a flip.
    "1" fuses every fitting site; "geo" fuses only geometries on the
    measured win frontier (ops.groupnorm.geo_wins) — fewer Pallas sites
    per program, sized to dodge the remote-compiler ceiling that blocked
    the all-sites A/B (PERF.md round-4/5)."""
    import os

    v = os.environ.get("EMCID_TPU_FUSED_GN", "0")
    return v if v in ("0", "1", "geo") else "0"


class _GNParams(nn.Module):
    """Parameter twin of ``nn.GroupNorm``: declares the same ``{scale,
    bias}`` leaves (names, shapes, inits, param dtype) so the param tree —
    and every converted checkpoint — is identical whichever path runs."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def _fused_ln() -> bool:
    """Opt-in twin of ``_fused_gn`` for the transformer-block LayerNorms
    (ops/layernorm.py), gated separately so the on-chip A/B can attribute
    wins per norm type."""
    import os

    return os.environ.get("EMCID_TPU_FUSED_LN", "0") == "1"


def _ln(x, *, dtype, name: str, tag: bool = False):
    """Transformer-block LayerNorm: stock flax by default; the fused
    Pallas kernel under EMCID_TPU_FUSED_LN=1 (same parameter-twin trick
    as ``_gn_act`` — the param tree is identical either way).

    eps=1e-5 matches torch's nn.LayerNorm default, which is what the
    reference's diffusers BasicTransformerBlock LayerNorms run (diffusers
    attention.py constructs nn.LayerNorm with no eps argument); flax's
    1e-6 default would be a silent parity deviation at all 48 sites."""
    if _fused_ln():
        from emcid_tpu.ops.layernorm import layer_norm_act

        scale, bias = _GNParams(x.shape[-1], name=name)()
        return _tag(layer_norm_act(x, scale, bias, eps=1e-5), tag)
    return _tag(nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)(x), tag)


def _gn_act(x, *, groups: int, eps: float, dtype, name: str,
            act: str = "none", tag: bool = False):
    """GroupNorm followed by an optional SiLU.  Stock flax path by default;
    one fused Pallas kernel (ops/groupnorm.py) under EMCID_TPU_FUSED_GN=1
    (every fitting site) or =geo (measured-win geometries only)."""
    mode = _fused_gn()
    if mode != "0":
        from emcid_tpu.ops.groupnorm import group_norm_act

        scale, bias = _GNParams(x.shape[-1], name=name)()
        return _tag(group_norm_act(x, scale, bias, num_groups=groups,
                                   eps=eps, act=act,
                                   geo_only=(mode == "geo")), tag)
    h = _tag(nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                          name=name)(x), tag)
    if act == "silu":
        h = _tag(jax.nn.silu(h), tag)
    return h


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, *, path: str = "", inject=None,
                 tag: bool = False):
        h = _gn_act(x, groups=self.norm_num_groups, eps=1e-5,
                    dtype=self.dtype, name="norm1", act="silu", tag=tag)
        h = _tag(nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="conv1")(h), tag)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(jax.nn.silu(temb))
        h = _tag(h + t[:, None, None, :], tag)
        h = _gn_act(h, groups=self.norm_num_groups, eps=1e-5,
                    dtype=self.dtype, name="norm2", act="silu", tag=tag)
        # conv2 is an editable layer (UNET_EDIT_TEMPLATES "conv-res")
        self.sow("intermediates", "conv2_in", h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        h = _tag(_inject_out(inject, f"{path}.conv2", h), tag)
        self.sow("intermediates", "conv2_out", h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention over NLC tokens; cross when context is given."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, path: str = "", inject=None,
                 tag: bool = False):
        ctx = x if context is None else context
        inner = x.shape[-1]
        head_dim = inner // self.num_heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        self.sow("intermediates", "kv_in", ctx)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        # K/V-projection edit seams (cross-attn EMCID mode,
        # reference compute_z_unet_x_kv, compute_z.py:2407-2643)
        k = _inject_out(inject, f"{path}.to_k", k)
        v = _inject_out(inject, f"{path}.to_v", v)
        self.sow("intermediates", "k_out", k)
        self.sow("intermediates", "v_out", v)
        B, N, _ = x.shape
        M = ctx.shape[1]
        # tag only the SELF-attention q/k/v (context is the spatial stream):
        # cross-attn k/v are (B, 77, C) — small, and recomputing them would
        # re-run the text-side dense from the saved context anyway
        tg = tag and context is None
        q = _tag(q.reshape(B, N, self.num_heads, head_dim), tg)
        k = _tag(k.reshape(B, M, self.num_heads, head_dim), tg)
        v = _tag(v.reshape(B, M, self.num_heads, head_dim), tg)
        # memory-bounded dispatch: pallas flash kernel on TPU for the long
        # spatial self-attention (N up to 4096), fused einsum for 77-token
        # cross-attention (see ops/attention.py)
        from emcid_tpu.ops.attention import attention as _attention

        out = _attention(q, k, v, scale=head_dim**-0.5).reshape(B, N, inner)
        # to_out.0 in HF (Dropout is to_out.1 — identity at inference);
        # its input is an editable key source (UNET_EDIT_TEMPLATES attn-out)
        self.sow("intermediates", "attn_out_in", out)
        out = nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)
        self.sow("intermediates", "attn_out_out", out)
        out = _inject_out(inject, path, out)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2×(4·dim), gate, project back."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, path: str = "", inject=None, tag: bool = False):
        dim = x.shape[-1]
        inner = dim * 4
        # HF: ff.net.0.proj (GEGLU), ff.net.2 (Linear)
        h = _tag(nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x),
                 tag)
        h, gate = jnp.split(h, 2, axis=-1)
        h, gate = _tag(h, tag), _tag(gate, tag)
        h = _tag(h * _tag(jax.nn.gelu(gate, approximate=False), tag), tag)
        self.sow("intermediates", "ff2_in", h)
        h = nn.Dense(dim, dtype=self.dtype, name="net_2")(h)
        h = _inject_out(inject, f"{path}.net.2", h)
        self.sow("intermediates", "ff2_out", h)
        return h


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, path: str = "", inject=None,
                 tag: bool = False):
        attn1 = CrossAttention(self.num_heads, dtype=self.dtype, name="attn1")
        attn2 = CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")
        ff = FeedForward(dtype=self.dtype, name="ff")
        x = x + attn1(
            _ln(x, dtype=self.dtype, name="norm1", tag=tag),
            path=f"{path}.attn1", inject=inject, tag=tag,
        )
        x = x + attn2(
            _ln(x, dtype=self.dtype, name="norm2", tag=tag), context,
            path=f"{path}.attn2", inject=inject, tag=tag,
        )
        x = x + ff(
            _ln(x, dtype=self.dtype, name="norm3", tag=tag),
            path=f"{path}.ff", inject=inject, tag=tag,
        )
        return x


class Transformer2D(nn.Module):
    num_heads: int
    depth: int = 1
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, path: str = "", inject=None,
                 tag: bool = False):
        B, H, W, C = x.shape
        residual = x
        h = _gn_act(x, groups=self.norm_num_groups, eps=1e-6,
                    dtype=self.dtype, name="norm", tag=tag)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = _tag(nn.Dense(C, dtype=self.dtype, name="proj_in")(h), tag)
        else:
            h = _tag(nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h),
                     tag)
            h = h.reshape(B, H * W, C)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads, dtype=self.dtype, name=f"transformer_blocks_{d}"
            )(h, context, path=f"{path}.transformer_blocks.{d}", inject=inject,
              tag=tag)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # HF pads (0,1,0,1) then VALID-stride-2 — keep the asymmetric pad for
        # weight-exactness with converted checkpoints.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # 2x nearest upsample as broadcast+reshape (a gather-based
        # jax.image.resize is slow on TPU)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class UNetOutput(NamedTuple):
    sample: jnp.ndarray


class UNet2DCondition(nn.Module):
    """Conditional UNet.  ``__call__(latents NHWC, timesteps (B,), context
    (B, S, D)[, added_cond]) → eps prediction NHWC``."""

    config: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,
        *,
        inject: Optional[Dict[str, jnp.ndarray]] = None,
        remat_tag_hw: int = 0,
    ) -> UNetOutput:
        """``remat_tag_hw > 0`` names the interior activations of every block
        whose spatial resolution is >= that value (``checkpoint_name``,
        "unet_interior") so callers can wrap the forward in
        ``jax.checkpoint(..., policy=save_anything_except_these_names(
        "unet_interior"))`` — selective remat: the high-resolution interiors
        (the bulk of residual HBM) are recomputed in the backward while
        everything else stays stored.  0 (default) leaves the jaxpr
        untouched."""
        cfg = self.config
        ctx = encoder_hidden_states
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        if timesteps.shape[0] != sample.shape[0]:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # --- time (+ SDXL added) embeddings ------------------------------
        t_emb_dim = cfg.block_out_channels[0]
        temb_dim = t_emb_dim * 4
        t_feat = timestep_embedding(timesteps, t_emb_dim,
                                    cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = nn.Dense(temb_dim, dtype=self.dtype,
                        name="time_embedding_linear_1")(t_feat.astype(self.dtype))
        temb = nn.Dense(temb_dim, dtype=self.dtype,
                        name="time_embedding_linear_2")(jax.nn.silu(temb))

        if cfg.addition_embed_type == "text_time":
            # SDXL: pooled text embed (B, D_pool) + micro-conds (B, 6)
            text_embeds = added_cond["text_embeds"]
            time_ids = added_cond["time_ids"]
            tid = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift,
            ).reshape(text_embeds.shape[0], -1)
            add = jnp.concatenate([text_embeds, tid.astype(text_embeds.dtype)], axis=-1)
            aemb = nn.Dense(temb_dim, dtype=self.dtype,
                            name="add_embedding_linear_1")(add.astype(self.dtype))
            aemb = nn.Dense(temb_dim, dtype=self.dtype,
                            name="add_embedding_linear_2")(jax.nn.silu(aemb))
            temb = temb + aemb

        use_linear = cfg.addition_embed_type == "text_time"  # SDXL convention

        # --- down path ----------------------------------------------------
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample)
        skips = [h]
        n_levels = len(cfg.block_out_channels)
        for lvl, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[lvl]
            has_attn = block_type == "CrossAttnDownBlock2D"
            bpath = f"down_blocks.{lvl}"
            for j in range(cfg.layers_per_block):
                tg = 0 < remat_tag_hw <= h.shape[1]
                h = ResnetBlock2D(
                    out_ch, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"down_blocks_{lvl}_resnets_{j}",
                )(h, temb, path=f"{bpath}.resnets.{j}", inject=inject, tag=tg)
                if has_attn:
                    h = Transformer2D(
                        cfg.attention_head_dim[lvl],
                        depth=cfg.transformer_layers_per_block[lvl],
                        norm_num_groups=cfg.norm_num_groups,
                        use_linear_projection=use_linear,
                        dtype=self.dtype,
                        name=f"down_blocks_{lvl}_attentions_{j}",
                    )(h, ctx, path=f"{bpath}.attentions.{j}", inject=inject,
                      tag=tg)
                skips.append(h)
            if lvl < n_levels - 1:
                h = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{lvl}_downsamplers_0")(h)
                skips.append(h)

        # --- mid ----------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_block_resnets_0")(
            h, temb, path="mid_block.resnets.0", inject=inject)
        h = Transformer2D(
            cfg.attention_head_dim[-1],
            depth=cfg.transformer_layers_per_block[-1],
            norm_num_groups=cfg.norm_num_groups,
            use_linear_projection=use_linear,
            dtype=self.dtype, name="mid_block_attentions_0",
        )(h, ctx, path="mid_block.attentions.0", inject=inject)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_block_resnets_1")(
            h, temb, path="mid_block.resnets.1", inject=inject)

        # --- up path ------------------------------------------------------
        rev_ch = list(reversed(cfg.block_out_channels))
        for lvl, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_ch[lvl]
            has_attn = block_type == "CrossAttnUpBlock2D"
            bpath = f"up_blocks.{lvl}"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                tg = 0 < remat_tag_hw <= h.shape[1]
                h = ResnetBlock2D(
                    out_ch, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_blocks_{lvl}_resnets_{j}",
                )(h, temb, path=f"{bpath}.resnets.{j}", inject=inject, tag=tg)
                if has_attn:
                    h = Transformer2D(
                        cfg.attention_head_dim[n_levels - 1 - lvl],
                        depth=cfg.transformer_layers_per_block[n_levels - 1 - lvl],
                        norm_num_groups=cfg.norm_num_groups,
                        use_linear_projection=use_linear,
                        dtype=self.dtype,
                        name=f"up_blocks_{lvl}_attentions_{j}",
                    )(h, ctx, path=f"{bpath}.attentions.{j}", inject=inject,
                      tag=tg)
            if lvl < n_levels - 1:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_blocks_{lvl}_upsamplers_0")(h)

        h = _gn_act(h, groups=cfg.norm_num_groups, eps=1e-5,
                    dtype=self.dtype, name="conv_norm_out", act="silu")
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        return UNetOutput(sample=h)

    def init_params(self, rng, batch: int = 1, context_len: int = 77):
        cfg = self.config
        sample = jnp.zeros(
            (batch, cfg.sample_size, cfg.sample_size, cfg.in_channels),
            dtype=jnp.float32,
        )
        ctx = jnp.zeros((batch, context_len, cfg.cross_attention_dim),
                        dtype=jnp.float32)
        t = jnp.zeros((batch,), dtype=jnp.int32)
        added = None
        if cfg.addition_embed_type == "text_time":
            pool_dim = (cfg.projection_class_embeddings_input_dim
                        - 6 * cfg.addition_time_embed_dim)
            added = {
                "text_embeds": jnp.zeros((batch, pool_dim), dtype=jnp.float32),
                "time_ids": jnp.zeros((batch, 6), dtype=jnp.float32),
            }
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, sample, t, ctx, added)["params"]


def cross_attn_kv_layer_names(config: UNetConfig) -> list:
    """All cross-attn to_k/to_v module names, enumerated in the REFERENCE's
    block order down → up → mid (layer_stats.py:470-486
    get_all_cross_attn_kv_layer_names block_types=['down_blocks',
    'up_blocks', 'mid_block']) so integer ``layers_to_edit`` indices select
    the same projections as the reference; all consumers key caches by the
    NAME, so only index semantics depend on this order."""
    names = []
    n_levels = len(config.block_out_channels)

    def block_names(prefix, lvl, n_attn, depth):
        out = []
        for j in range(n_attn):
            for d in range(depth):
                base = f"{prefix}.attentions.{j}.transformer_blocks.{d}.attn2"
                out.append(f"{base}.to_k")
                out.append(f"{base}.to_v")
        return out

    for lvl, bt in enumerate(config.down_block_types):
        if bt == "CrossAttnDownBlock2D":
            names += block_names(f"down_blocks.{lvl}", lvl,
                                 config.layers_per_block,
                                 config.transformer_layers_per_block[lvl])
    for lvl, bt in enumerate(config.up_block_types):
        if bt == "CrossAttnUpBlock2D":
            names += block_names(f"up_blocks.{lvl}", n_levels - 1 - lvl,
                                 config.layers_per_block + 1,
                                 config.transformer_layers_per_block[n_levels - 1 - lvl])
    names += block_names("mid_block", n_levels - 1, 1,
                         config.transformer_layers_per_block[-1])
    return names
