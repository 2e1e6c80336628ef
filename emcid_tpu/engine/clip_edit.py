"""Full CLIP-model joint edit: the ReFACT/contrastive protocol applied to a
standalone CLIP text tower (reference apply_emcid_to_clip /
execute_emcid_clip, emcid_main.py:109-311).

Structurally the same two stages as the SD text-encoder edit — Stage-1 is
``compute_z_refact`` (contrastive pooled-embedding objective) per request,
Stage-2 the identical MEMIT-style multi-layer fc2 insert — but the model is
a CLIPTextEncoder (typically with projection) outside any diffusion
pipeline, so the interface here is (model, params, tokenizer) rather than
SDComponents.  Functional params replace the reference's
weights_copy/restore dance."""

from __future__ import annotations

from types import SimpleNamespace
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from emcid_tpu.engine.compute_z_variants import compute_z_refact
from emcid_tpu.engine.emcid import (
    execute_emcid_text_encoder,
    load_z_list,
    save_z_cache,
)
from emcid_tpu.engine.layer_stats import get_cov_text_encoder


def execute_emcid_clip(
    text_model,
    text_params,
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    covs: Optional[Sequence] = None,
    stats_dir=None,
    stats_captions: Optional[Sequence[str]] = None,
    cache_name: Optional[str] = None,
    mom2_weight: Optional[float] = None,
    edit_weight: Optional[float] = None,
    rng_seed: int = 0,
    model_name: str = "clip_text",
    verbose: bool = True,
) -> Tuple[Dict[str, Tuple[np.ndarray, np.ndarray]], Dict]:
    """(deltas, edited_params) for a CLIP text tower
    (reference execute_emcid_clip, emcid_main.py:148-311).

    Per request: contrastive z (compute_z_refact, z-npz cached with the
    reference's source_/dest_ key), then one fused multi-layer insert."""
    shim = SimpleNamespace(tokenizer=tokenizer, text_encoder=text_model,
                           text_params=text_params)
    z_list, missing = load_z_list(requests, cache_name, hparams)
    for i in missing:
        z = compute_z_refact(
            shim, requests[i], hparams, hparams.layers[-1],
            rng=jax.random.PRNGKey(rng_seed + i), verbose=verbose,
        )
        z_list[i] = z
        if cache_name is not None:
            save_z_cache(cache_name, requests[i], z, hparams, idx=i)
    zs = np.stack([np.asarray(z) for z in z_list])
    if zs.ndim == 2:
        zs = zs[:, None, :]

    if covs is None:
        from emcid_tpu.engine.editor import resolve_covariances_for

        covs = resolve_covariances_for(
            text_model, text_params, tokenizer, hparams,
            stats_dir=stats_dir, captions=stats_captions,
            model_name=model_name, verbose=verbose,
        )

    return execute_emcid_text_encoder(
        text_model, text_params, tokenizer, requests, hparams,
        zs=zs, covs=covs, mom2_weight=mom2_weight, edit_weight=edit_weight,
        verbose=verbose,
    )


def apply_emcid_to_clip(
    text_model,
    text_params,
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    mom2_weight: Optional[float] = None,
    edit_weight: Optional[float] = None,
    cache_name: Optional[str] = None,
    return_orig_text_model: bool = False,
    **kwargs,
):
    """Edited CLIP text params (reference apply_emcid_to_clip,
    emcid_main.py:109-146).  Functional: the caller's ``text_params`` are
    untouched; ``return_orig_text_model`` keeps the reference signature but
    simply hands them back."""
    deltas, new_params = execute_emcid_clip(
        text_model, text_params, tokenizer, requests, hparams,
        cache_name=cache_name, mom2_weight=mom2_weight,
        edit_weight=edit_weight, **kwargs,
    )
    if return_orig_text_model:
        return new_params, deltas, text_params
    return new_params, deltas
