"""Torch dotted-name ↔ Flax param-path resolution.

The reference addresses weights by torch module path strings like
``text_model.encoder.layers.7.mlp.fc2`` (hparams rewrite_module_tmp;
resolved via nethook.get_parameter, reference nethook.py:385-395).  Those
strings are part of the public hparams surface, so we keep them and resolve
them onto the Flax param pytree here.

Flax layout for CLIPTextEncoder:
    layers_{i}/self_attn/{q,k,v,out}_proj/{kernel,bias}
    layers_{i}/mlp/{fc1,fc2}/{kernel,bias}
    layers_{i}/layer_norm{1,2}/{scale,bias}
    token_embedding/embedding, position_embedding/embedding,
    final_layer_norm/{scale,bias}

NOTE on orientation: torch ``Linear.weight`` is (out, in); Flax ``Dense``
kernel is (in, out).  ``get_weight`` returns the torch-oriented (out, in)
view so the closed-form solve code matches the reference's math
(W += resid @ adj_k^T with W (out, in), emcid_main.py:1049-1065);
``set_weight`` transposes back.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp


def torch_name_to_flax_path(name: str) -> Tuple[str, ...]:
    """Map a torch CLIPTextModel dotted module name to the Flax param path
    prefix (without the trailing kernel/bias leaf)."""
    parts = name.split(".")
    # strip the HF wrapper prefixes: text_model.encoder / text_model
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("text_model", "encoder"):
            i += 1
            continue
        if p == "layers" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"layers_{parts[i + 1]}")
            i += 2
            continue
        if p == "embeddings":
            i += 1
            continue
        out.append(p)
        i += 1
    return tuple(out)


def get_subtree(params: Dict[str, Any], path: Tuple[str, ...]):
    node = params
    for p in path:
        if p not in node:
            raise KeyError(
                f"param path {'/'.join(path)} not found (missing {p!r}; "
                f"available: {list(node)[:8]}...)"
            )
        node = node[p]
    return node


def get_weight(params: Dict[str, Any], torch_name: str) -> jnp.ndarray:
    """Fetch a weight by torch dotted name, returned (out, in) torch-oriented."""
    sub = get_subtree(params, torch_name_to_flax_path(torch_name))
    if "kernel" in sub:
        return sub["kernel"].T
    if "embedding" in sub:
        return sub["embedding"]
    if "scale" in sub:
        return sub["scale"]
    raise KeyError(f"no weight leaf under {torch_name}")


def set_weight(params: Dict[str, Any], torch_name: str, value) -> Dict[str, Any]:
    """Functionally replace a weight ((out, in) torch-oriented input) and
    return a new params pytree.  Mutation-free: copies only the touched path."""
    path = torch_name_to_flax_path(torch_name)

    def _set(node, depth):
        node = dict(node)
        if depth == len(path):
            if "kernel" in node:
                node["kernel"] = jnp.asarray(value).T.astype(node["kernel"].dtype)
            elif "embedding" in node:
                node["embedding"] = jnp.asarray(value).astype(node["embedding"].dtype)
            elif "scale" in node:
                node["scale"] = jnp.asarray(value).astype(node["scale"].dtype)
            else:
                raise KeyError(f"no weight leaf under {torch_name}")
            return node
        key = path[depth]
        node[key] = _set(node[key], depth + 1)
        return node

    return _set(params, 0)


def layer_index_from_template(template: str, layer: int) -> str:
    """``"text_model.encoder.layers.{}.mlp.fc2"``, 7 → filled name."""
    return template.format(layer)
