"""CLIP text encoder as a pure-functional Flax module with activation taps.

This replaces the reference's torch forward hooks (util/nethook.py Trace /
TraceDict, reference nethook.py:22-200) with explicit function I/O:

* **capture** — instead of ``Trace(..., retain_input=True)`` on
  ``layers.{i}.mlp.fc2`` (reference layer_stats.py:212-215,
  compute_z.py:2296-2316), the forward optionally returns stacked per-layer
  activations (``fc2_in``, ``fc2_out``, ``layer_out``) as arrays with a
  leading layer axis.
* **injection** — instead of ``TraceDict(..., edit_output=+delta)`` mutating
  a mid-layer output in flight (reference compute_z.py:353-373, 509-517),
  the forward takes ``(inject_layer, inject_mask, inject_delta)`` and adds
  ``inject_mask[..., None] * inject_delta`` to that layer's output hidden
  state.  Because it is part of the traced function, gradients flow through
  the injection for Stage-1 optimization — and the whole thing vmaps over
  concepts.
* **early stop** — instead of ``StopForward`` (reference nethook.py:203-216),
  ``stop_at_layer`` statically truncates the layer stack, so the stats sweep
  compiles a genuinely shorter program.

Weight layout matches HF ``CLIPTextModel`` module names so conversion is a
mechanical transpose (see models/convert_hf.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emcid_tpu.models.configs import CLIPTextConfig


class TextOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # (B, S, H) — after final LN
    pooled_output: Optional[jnp.ndarray]  # (B, H) at first-EOS position
    taps: Dict[str, jnp.ndarray]  # name → (L, B, S, D) stacked captures


def _activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        dense = lambda name: nn.Dense(h, dtype=self.dtype, name=name)
        q = dense("q_proj")(hidden) * (hd**-0.5)
        k = dense("k_proj")(hidden)
        v = dense("v_proj")(hidden)
        B, S, _ = hidden.shape
        split = lambda x: x.reshape(B, S, nh, hd)
        # (B, nh, S, S) scores; seq is 77 — a fused einsum softmax is already
        # MXU-shaped, no pallas needed at this length (SURVEY.md §5: the
        # sequence axis is trivially small).
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, S, h)
        return dense("out_proj")(out)


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        act = _activation(cfg.hidden_act)
        fc1 = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")
        fc2_in = act(fc1(hidden))
        fc2_out = fc2(fc2_in)
        return fc2_out, fc2_in


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="layer_norm1")
        ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="layer_norm2")
        attn = CLIPAttention(cfg, dtype=self.dtype, name="self_attn")
        mlp = CLIPMLP(cfg, dtype=self.dtype, name="mlp")

        hidden = hidden + attn(ln1(hidden), mask)
        fc2_out, fc2_in = mlp(ln2(hidden))
        hidden = hidden + fc2_out
        return hidden, fc2_in, fc2_out


class CLIPTextEncoder(nn.Module):
    """CLIP text transformer with taps, injection, and early stop.

    ``__call__`` kwargs (all static except arrays):

    * ``inject_layer``: static int (or None) — index of the encoder layer at
      whose *output* the delta is added (matches the reference's
      layer_module_tmp hook point, compute_z.py:509-517).
    * ``inject_delta``: (B, H) or (B, S, H); ``inject_mask``: (B, S) float.
    * ``capture``: static tuple from {"fc2_in", "fc2_out", "layer_out",
      "embed"} — returns stacked (L, B, S, D) arrays in ``.taps``.
    * ``stop_at_layer``: static int — run layers [0, stop_at_layer] only and
      skip final LN/pool (fc2 captures of later layers are absent).
    * ``embed_noise``: optional (B, S, H) added to the token+position
      embedding (the causal-tracing corruption seam,
      reference causal_trace.py:240-251).
    * ``patch_spec``: optional (token-patching seam for causal tracing) dict
      ``{layer_idx: (B, S) mask}`` — at each given layer output, rows
      1.. of the batch get their masked token states replaced by row 0's
      (reference trace_with_patch_text_encoder, causal_trace.py:252-259).
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        *,
        inject_layer: Optional[int] = None,
        inject_delta: Optional[jnp.ndarray] = None,
        inject_mask: Optional[jnp.ndarray] = None,
        capture: Sequence[str] = (),
        stop_at_layer: Optional[int] = None,
        embed_noise: Optional[jnp.ndarray] = None,
        patch_spec: Optional[Dict[int, jnp.ndarray]] = None,
        final_ln: bool = True,
    ) -> TextOutput:
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos_ids = jnp.arange(S)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(pos_ids)
        hidden = tok + pos
        if embed_noise is not None:
            hidden = hidden + embed_noise.astype(hidden.dtype)

        # causal mask (+ optional padding mask), additive −inf form
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.where(
            jnp.tril(jnp.ones((S, S), dtype=bool)), 0.0, neg
        )[None, None, :, :]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
            mask = causal + pad
        else:
            mask = causal

        captures: Dict[str, list] = {name: [] for name in capture}
        if "embed" in captures:
            captures["embed"].append(hidden)

        n_layers = cfg.num_hidden_layers
        last = n_layers - 1 if stop_at_layer is None else stop_at_layer
        for i in range(n_layers):
            if i > last:
                # Keep module structure identical regardless of stop point so
                # params always initialize for every layer.
                _ = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
                continue
            hidden, fc2_in, fc2_out = CLIPEncoderLayer(
                cfg, dtype=self.dtype, name=f"layers_{i}"
            )(hidden, mask)
            if inject_layer == i and inject_delta is not None:
                delta = inject_delta
                if delta.ndim == 2:
                    delta = delta[:, None, :]
                m = (
                    inject_mask[..., None]
                    if inject_mask is not None
                    else jnp.ones((B, S, 1), dtype=hidden.dtype)
                )
                hidden = hidden + m.astype(hidden.dtype) * delta.astype(hidden.dtype)
            if patch_spec is not None and i in patch_spec:
                pm = patch_spec[i][..., None].astype(hidden.dtype)  # (B, S, 1)
                clean = hidden[0:1]
                hidden = (1.0 - pm) * hidden + pm * clean
            if "fc2_in" in captures:
                captures["fc2_in"].append(fc2_in)
            if "fc2_out" in captures:
                captures["fc2_out"].append(fc2_out)
            if "layer_out" in captures:
                captures["layer_out"].append(hidden)

        taps = {k: jnp.stack(v) for k, v in captures.items() if v}

        if stop_at_layer is not None:
            return TextOutput(hidden, None, taps)

        if final_ln:
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                name="final_layer_norm"
            )(hidden)
        else:
            # still materialize final LN params for checkpoint compatibility
            _ = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                name="final_layer_norm",
            )

        # pooled output at the first EOS position (CLIP pads with EOS, so
        # argmax of the equality mask = first occurrence)
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = hidden[jnp.arange(B), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return TextOutput(hidden, pooled, taps)

    def init_params(self, rng, seq_len: Optional[int] = None):
        S = seq_len or self.config.max_position_embeddings
        dummy = jnp.zeros((1, S), dtype=jnp.int32)
        return self.init(rng, dummy)["params"]
