"""HF torch checkpoint → Flax param conversion.

The reference loads every model from the HuggingFace hub at runtime.  This
module converts a torch ``state_dict`` (from any locally available
CLIPTextModel / UNet2DConditionModel / AutoencoderKL checkpoint, e.g. a user's
HF cache) into this package's Flax param pytrees.  Conversion is pure
name-mapping + transposes; no torch import is required unless tensors are
torch (numpy arrays work the same).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """'a/b/c' → nested dicts."""
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def clip_text_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert HF ``CLIPTextModel`` (or the text_model subtree of CLIPModel)
    weights to CLIPTextEncoder params."""
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        t = _np(tensor)
        n = name
        for prefix in ("text_model.",):
            if n.startswith(prefix):
                n = n[len(prefix):]
        if n.startswith("embeddings.token_embedding.weight"):
            flat["token_embedding/embedding"] = t
        elif n.startswith("embeddings.position_embedding.weight"):
            flat["position_embedding/embedding"] = t
        elif n == "embeddings.position_ids":
            continue
        elif n.startswith("encoder.layers."):
            rest = n[len("encoder.layers."):]
            idx, sub = rest.split(".", 1)
            base = f"layers_{idx}"
            if sub.endswith(".weight") and (".fc" in sub or "_proj" in sub):
                mod = sub[: -len(".weight")].replace(".", "/")
                flat[f"{base}/{mod}/kernel"] = t.T
            elif sub.endswith(".bias") and (".fc" in sub or "_proj" in sub):
                mod = sub[: -len(".bias")].replace(".", "/")
                flat[f"{base}/{mod}/bias"] = t
            elif sub.endswith(".weight"):  # layer norms
                mod = sub[: -len(".weight")].replace(".", "/")
                flat[f"{base}/{mod}/scale"] = t
            elif sub.endswith(".bias"):
                mod = sub[: -len(".bias")].replace(".", "/")
                flat[f"{base}/{mod}/bias"] = t
        elif n == "final_layer_norm.weight":
            flat["final_layer_norm/scale"] = t
        elif n == "final_layer_norm.bias":
            flat["final_layer_norm/bias"] = t
        elif n in ("text_projection.weight",):
            flat["text_projection/kernel"] = t.T
    return _nest(flat)


def clip_text_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (for exporting edited weights back to an HF
    checkpoint; the reference never persists edits — SURVEY.md §5 — but we
    support it)."""
    sd: Dict[str, np.ndarray] = {}
    p = params
    sd["text_model.embeddings.token_embedding.weight"] = _np(
        p["token_embedding"]["embedding"]
    )
    sd["text_model.embeddings.position_embedding.weight"] = _np(
        p["position_embedding"]["embedding"]
    )
    for key, sub in p.items():
        if not key.startswith("layers_"):
            continue
        idx = key.split("_", 1)[1]
        base = f"text_model.encoder.layers.{idx}"
        for mod_name, leaf in _iter_modules(sub):
            torch_mod = f"{base}.{mod_name}"
            if "kernel" in leaf:
                sd[f"{torch_mod}.weight"] = _np(leaf["kernel"]).T
                if "bias" in leaf:
                    sd[f"{torch_mod}.bias"] = _np(leaf["bias"])
            elif "scale" in leaf:
                sd[f"{torch_mod}.weight"] = _np(leaf["scale"])
                sd[f"{torch_mod}.bias"] = _np(leaf["bias"])
    if "final_layer_norm" in p:
        sd["text_model.final_layer_norm.weight"] = _np(p["final_layer_norm"]["scale"])
        sd["text_model.final_layer_norm.bias"] = _np(p["final_layer_norm"]["bias"])
    if "text_projection" in p:
        sd["text_projection.weight"] = _np(p["text_projection"]["kernel"]).T
    return sd


def _iter_modules(tree: Dict[str, Any], prefix: str = ""):
    """Yield (dotted_name, leaf_dict) for each module holding array leaves."""
    has_leaf = any(not isinstance(v, dict) for v in tree.values())
    if has_leaf:
        yield prefix.rstrip("."), tree
        return
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_modules(v, prefix + k + ".")


# ---------------------------------------------------------------------------
# Generic UNet / VAE conversion.
#
# Our Flax modules use underscore-flattened HF names ("down_blocks_0_resnets_0"
# holding "conv1", "transformer_blocks_0" holding "attn2/to_k", ...).  The
# mapping to HF dotted names is mechanical: numeric path tokens become ".N"
# separators, with a short special-case table.  The mapping is *generated
# from the Flax param tree*, which guarantees it covers exactly our
# architecture — conversion then runs in either direction off the same table.
# ---------------------------------------------------------------------------

import re as _re

# Ordered structural rewrite rules, applied per path component.  Explicit
# rather than heuristic: underscore-flattened names are ambiguous
# ("mid_block_resnets_0" must become "mid_block.resnets.0", but
# "quant_conv" must stay as-is), so each known shape is listed.
_COMPONENT_RULES = [
    (_re.compile(r"^(down_blocks|up_blocks)_(\d+)_"
                 r"(resnets|attentions|downsamplers|upsamplers)_(\d+)_conv$"),
     r"\1.\2.\3.\4.conv"),
    (_re.compile(r"^(down_blocks|up_blocks)_(\d+)_"
                 r"(resnets|attentions|downsamplers|upsamplers)_(\d+)$"),
     r"\1.\2.\3.\4"),
    (_re.compile(r"^mid_block_(resnets|attentions)_(\d+)$"),
     r"mid_block.\1.\2"),
    (_re.compile(r"^transformer_blocks_(\d+)$"), r"transformer_blocks.\1"),
    (_re.compile(r"^to_out_0$"), "to_out.0"),
    (_re.compile(r"^net_0_proj$"), "net.0.proj"),
    (_re.compile(r"^net_2$"), "net.2"),
    (_re.compile(r"^time_embedding_linear_(\d)$"), r"time_embedding.linear_\1"),
    (_re.compile(r"^add_embedding_linear_(\d)$"), r"add_embedding.linear_\1"),
    (_re.compile(r"^layers_(\d+)$"), r"layers.\1"),
]


def _flax_component_to_hf(name: str) -> str:
    """'down_blocks_0_resnets_0' → 'down_blocks.0.resnets.0' etc.; names
    with no structural match pass through unchanged."""
    for pattern, repl in _COMPONENT_RULES:
        if pattern.match(name):
            return pattern.sub(repl, name)
    return name


def _flax_path_to_hf_name(path: Tuple[str, ...]) -> str:
    return ".".join(_flax_component_to_hf(p) for p in path)


def _leaf_to_torch(leaf_name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    v = _np(value)
    if leaf_name == "kernel":
        if v.ndim == 2:  # Dense (in, out) → Linear (out, in)
            return "weight", v.T
        if v.ndim == 4:  # Conv (kh, kw, in, out) → (out, in, kh, kw)
            return "weight", v.transpose(3, 2, 0, 1)
        raise ValueError(f"unexpected kernel ndim {v.ndim}")
    if leaf_name == "scale":
        return "weight", v
    if leaf_name == "embedding":
        return "weight", v
    return leaf_name, v  # bias


def _leaf_from_torch(leaf_name: str, flax_value: np.ndarray,
                     torch_value) -> np.ndarray:
    v = _np(torch_value)
    if leaf_name == "kernel":
        if flax_value.ndim == 2:
            return v.T
        if flax_value.ndim == 4:
            return v.transpose(2, 3, 1, 0)
    return v


def _walk_leaves(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk_leaves(v, prefix + (k,))
        else:
            yield prefix, k, v


def flax_to_hf_mapping(params: Dict[str, Any],
                       prefix: str = "") -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """HF state_dict name → (flax path, leaf name), generated from params."""
    mapping = {}
    for path, leaf, value in _walk_leaves(params):
        hf_mod = _flax_path_to_hf_name(path)
        hf_leaf, _ = _leaf_to_torch(leaf, np.zeros((1, 1)) if leaf == "kernel"
                                    and np.ndim(value) == 2 else value)
        # leaf translation only needs the name here
        hf_leaf = {"kernel": "weight", "scale": "weight",
                   "embedding": "weight"}.get(leaf, leaf)
        full = f"{prefix}{hf_mod}.{hf_leaf}"
        mapping[full] = (path, leaf)
    return mapping


def unet_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """UNet Flax params → HF UNet2DConditionModel state_dict (numpy)."""
    sd = {}
    for path, leaf, value in _walk_leaves(params):
        hf_mod = _flax_path_to_hf_name(path)
        hf_leaf, v = _leaf_to_torch(leaf, value)
        sd[f"{hf_mod}.{hf_leaf}"] = v
    return sd


def unet_from_torch(state_dict: Mapping[str, Any],
                    flax_template: Dict[str, Any]) -> Dict[str, Any]:
    """HF UNet2DConditionModel state_dict → Flax params.

    ``flax_template`` (e.g. from ``init_params``) fixes the target structure;
    every template leaf must find its HF counterpart or a KeyError names it.
    """
    mapping = flax_to_hf_mapping(flax_template)
    flat: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    for hf_name, (path, leaf) in mapping.items():
        if hf_name not in state_dict:
            raise KeyError(f"missing weight in torch checkpoint: {hf_name}")
        tmpl = flat  # walk/create
        node = flat.setdefault(path, {})
        template_leaf = _get_template_leaf(flax_template, path, leaf)
        node[leaf] = _leaf_from_torch(leaf, template_leaf, state_dict[hf_name])
    nested: Dict[str, Any] = {}
    for path, leaves in flat.items():
        node = nested
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {}).update(leaves)
    return nested


def _get_template_leaf(tree, path, leaf):
    node = tree
    for p in path:
        node = node[p]
    return node[leaf]


def vae_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """VAE Flax params → HF AutoencoderKL state_dict."""
    sd = {}
    for path, leaf, value in _walk_leaves(params):
        hf_mod = _flax_path_to_hf_name(path)
        hf_leaf, v = _leaf_to_torch(leaf, value)
        sd[f"{hf_mod}.{hf_leaf}"] = v
    return sd


def vae_from_torch(state_dict: Mapping[str, Any],
                   flax_template: Dict[str, Any]) -> Dict[str, Any]:
    return unet_from_torch(state_dict, flax_template)
