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
