"""open_clip checkpoint conversion (the ViT-bigG-14 scorer of RoAD/TIMED,
reference refact_benchmark_eval.py:361-364, and SDXL's text_encoder_2
original weights).

open_clip state-dict layout differs from HF CLIP:
  text:  token_embedding.weight, positional_embedding,
         transformer.resblocks.{i}.{ln_1,ln_2}.{weight,bias},
         .attn.in_proj_weight/in_proj_bias (fused qkv), .attn.out_proj,
         .mlp.c_fc, .mlp.c_proj, ln_final, text_projection (matrix param)
  vision: visual.conv1.weight, visual.class_embedding,
         visual.positional_embedding, visual.ln_pre, visual.ln_post,
         visual.transformer.resblocks..., visual.proj

Both convert onto this package's CLIPTextEncoder / CLIPVisionEncoder param
layouts (fused qkv split into q/k/v).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _resblock(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """One open_clip residual block → CLIPEncoderLayer params."""
    in_w = _np(sd[f"{prefix}.attn.in_proj_weight"])  # (3H, H)
    in_b = _np(sd[f"{prefix}.attn.in_proj_bias"])
    H = in_w.shape[1]
    qw, kw, vw = in_w[:H], in_w[H:2 * H], in_w[2 * H:]
    qb, kb, vb = in_b[:H], in_b[H:2 * H], in_b[2 * H:]
    lin = lambda w, b: {"kernel": w.T, "bias": b}
    ln = lambda n: {"scale": _np(sd[f"{prefix}.{n}.weight"]),
                    "bias": _np(sd[f"{prefix}.{n}.bias"])}
    return {
        "self_attn": {
            "q_proj": lin(qw, qb),
            "k_proj": lin(kw, kb),
            "v_proj": lin(vw, vb),
            "out_proj": lin(_np(sd[f"{prefix}.attn.out_proj.weight"]),
                            _np(sd[f"{prefix}.attn.out_proj.bias"])),
        },
        "mlp": {
            "fc1": lin(_np(sd[f"{prefix}.mlp.c_fc.weight"]),
                       _np(sd[f"{prefix}.mlp.c_fc.bias"])),
            "fc2": lin(_np(sd[f"{prefix}.mlp.c_proj.weight"]),
                       _np(sd[f"{prefix}.mlp.c_proj.bias"])),
        },
        "layer_norm1": ln("ln_1"),
        "layer_norm2": ln("ln_2"),
    }


def openclip_text_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """open_clip text tower → CLIPTextEncoder params (with text_projection)."""
    sd = state_dict
    p: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "position_embedding": {"embedding": _np(sd["positional_embedding"])},
        "final_layer_norm": {"scale": _np(sd["ln_final.weight"]),
                             "bias": _np(sd["ln_final.bias"])},
    }
    i = 0
    while f"transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        p[f"layers_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
        i += 1
    if "text_projection" in sd:
        # open_clip stores the projection as a plain (H, proj) matrix
        p["text_projection"] = {"kernel": _np(sd["text_projection"])}
    return p


def openclip_vision_from_torch(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """open_clip visual tower → CLIPVisionEncoder params."""
    sd = {k[len("visual."):]: v for k, v in state_dict.items()
          if k.startswith("visual.")} or dict(state_dict)
    p: Dict[str, Any] = {
        "class_embedding": _np(sd["class_embedding"]),
        "patch_embedding": {
            "kernel": _np(sd["conv1.weight"]).transpose(2, 3, 1, 0)
        },
        "position_embedding": {"embedding": _np(sd["positional_embedding"])},
        "pre_layrnorm": {"scale": _np(sd["ln_pre.weight"]),
                         "bias": _np(sd["ln_pre.bias"])},
        "post_layernorm": {"scale": _np(sd["ln_post.weight"]),
                           "bias": _np(sd["ln_post.bias"])},
    }
    i = 0
    while f"transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        p[f"layers_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
        i += 1
    if "proj" in sd:
        p["visual_projection"] = {"kernel": _np(sd["proj"])}
    return p


# bigG text/vision architecture constants (for constructing the Flax configs)
BIGG_TEXT = dict(hidden_size=1280, intermediate_size=5120,
                 num_hidden_layers=32, num_attention_heads=20,
                 hidden_act="gelu", projection_dim=1280)
BIGG_VISION = dict(hidden_size=1664, intermediate_size=8192,
                   num_hidden_layers=48, num_attention_heads=16,
                   patch_size=14, image_size=224, projection_dim=1280,
                   hidden_act="gelu")
