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
* **single-layer stepping** — ``embed`` / ``layer_forward`` methods expose
  the layer walk so the Stage-2 insert streams each batch through the stack
  exactly once while editing weights mid-walk (engine/emcid.py), instead of
  the reference's full re-forward per edited layer (emcid_main.py:981-1004).

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
    pooled_output: Optional[jnp.ndarray]  # (B, H/proj) at first-EOS position
    taps: Dict[str, jnp.ndarray]  # name → (L, B, S, D) stacked captures


def _activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


def causal_attention_mask(seq_len: int, attention_mask: Optional[jnp.ndarray] = None):
    """Additive (−inf form) causal mask, optionally combined with padding."""
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.where(
        jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool)), 0.0, neg
    )[None, None, :, :]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        return causal + pad
    return causal


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    def setup(self):
        h = self.config.hidden_size
        self.q_proj = nn.Dense(h, dtype=self.dtype)
        self.k_proj = nn.Dense(h, dtype=self.dtype)
        self.v_proj = nn.Dense(h, dtype=self.dtype)
        self.out_proj = nn.Dense(h, dtype=self.dtype)

    def __call__(self, hidden, mask):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        q = self.q_proj(hidden) * (hd**-0.5)
        k = self.k_proj(hidden)
        v = self.v_proj(hidden)
        B, S, _ = hidden.shape
        split = lambda x: x.reshape(B, S, nh, hd)
        # (B, nh, S, S) scores; seq is 77 — a fused einsum+softmax is already
        # MXU-shaped, no pallas needed at this length (SURVEY.md §5: the
        # sequence axis is trivially small).
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, S, h)
        return self.out_proj(out)


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.fc1 = nn.Dense(cfg.intermediate_size, dtype=self.dtype)
        self.fc2 = nn.Dense(cfg.hidden_size, dtype=self.dtype)

    def __call__(self, hidden):
        act = _activation(self.config.hidden_act)
        fc2_in = act(self.fc1(hidden))
        fc2_out = self.fc2(fc2_in)
        return fc2_out, fc2_in


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.layer_norm1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype)
        self.layer_norm2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype)
        self.self_attn = CLIPAttention(cfg, dtype=self.dtype)
        self.mlp = CLIPMLP(cfg, dtype=self.dtype)

    def __call__(self, hidden, mask):
        hidden = hidden + self.self_attn(self.layer_norm1(hidden), mask)
        fc2_out, fc2_in = self.mlp(self.layer_norm2(hidden))
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
      skip final LN/pool.
    * ``embed_noise``: optional (B, S, H) added to the token+position
      embedding (the causal-tracing corruption seam,
      reference causal_trace.py:240-251).
    * ``patch_spec``: token-patching seam for causal tracing — dict
      ``{layer_idx: (B, S) mask}``; at each given layer output, rows 1.. of
      the batch get masked token states replaced from row 0
      (reference causal_trace.py:252-259).
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_embedding = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=self.dtype)
        self.position_embedding = nn.Embed(cfg.max_position_embeddings,
                                           cfg.hidden_size, dtype=self.dtype)
        self.layers = [
            CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                             dtype=self.dtype)
        if cfg.projection_dim is not None:
            self.text_projection = nn.Dense(cfg.projection_dim, use_bias=False,
                                            dtype=self.dtype)

    # ---- stepping API (used by engine/emcid.py one-pass insert) ----------
    def embed(self, input_ids, embed_noise=None):
        S = input_ids.shape[1]
        hidden = self.token_embedding(input_ids) + self.position_embedding(
            jnp.arange(S)[None, :]
        )
        if embed_noise is not None:
            hidden = hidden + embed_noise.astype(hidden.dtype)
        return hidden

    def layer_forward(self, hidden, mask, layer_idx: int):
        """Run a single encoder layer; returns (hidden, fc2_in, fc2_out)."""
        return self.layers[layer_idx](hidden, mask)

    def final(self, hidden, input_ids):
        """Final LN + EOS pooling (+ optional projection)."""
        cfg = self.config
        hidden = self.final_layer_norm(hidden)
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = hidden[jnp.arange(hidden.shape[0]), eos_pos]
        if cfg.projection_dim is not None:
            pooled = self.text_projection(pooled)
        return hidden, pooled

    # ---- full forward ----------------------------------------------------
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
    ) -> TextOutput:
        cfg = self.config
        B, S = input_ids.shape
        hidden = self.embed(input_ids, embed_noise)
        mask = causal_attention_mask(S, attention_mask)

        captures: Dict[str, list] = {name: [] for name in capture}
        if "embed" in captures:
            captures["embed"].append(hidden)

        last = cfg.num_hidden_layers - 1 if stop_at_layer is None else stop_at_layer
        for i in range(min(last, cfg.num_hidden_layers - 1) + 1):
            hidden, fc2_in, fc2_out = self.layers[i](hidden, mask)
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

        hidden, pooled = self.final(hidden, input_ids)
        return TextOutput(hidden, pooled, taps)

    def init_params(self, rng, seq_len: Optional[int] = None):
        S = seq_len or self.config.max_position_embeddings
        dummy = jnp.zeros((1, S), dtype=jnp.int32)
        from emcid_tpu.models._jit_init import run_init

        return run_init(self.init, rng, dummy)["params"]
