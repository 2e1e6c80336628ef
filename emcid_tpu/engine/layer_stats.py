"""Covariance (second-moment) pre-cache: C = E[k k^T] over a caption corpus.

Functional equivalent of the reference's ``layer_stats_text_encoder``
(layer_stats.py:140-220) + ``get_cov_text_encoder`` (emcid_main.py:2239-2276):
for each edited layer, the second moment of fc2 *inputs* over ~100k captions,
cached as npz with the same path codec
``{stats_dir}/{model_name}/{ds_name}_stats/{layer_name}_{precision}_{collect}
_t{batch_tokens}_{sample_size}.npz`` so reference-produced caches drop in.

TPU-first differences:

* the partial forward (``stop_at_layer``) compiles a genuinely truncated
  program — no StopForward exception unwinding;
* batches are fixed-shape (B, S) with attention-mask weighting instead of
  variable token-budget buckets: masked positions multiply to zero in the
  ``a^T a`` accumulate, so the math is identical to the reference's
  flatten_masked_batch gather (stat_dataset.py:166-172) with no dynamic
  shapes;
* accumulation is a jit'd f32 matmul-accumulate on device; sharding the
  batch axis over a mesh turns the final accumulate into a psum handled by
  XLA (see emcid_tpu.parallel).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.stats import CombinedStat, Mean, NormMean, SecondMoment, tally

STAT_TYPES = {
    "mom2": SecondMoment,
    "mean": Mean,
    "norm_mean": NormMean,
}

# In-memory covariance memo keyed (model_name, layer_name)
# (reference emcid_main.py:36, 2239-2276).
COV_CACHE: Dict[Tuple[str, str], np.ndarray] = {}


def stats_filename(
    stats_dir,
    model_name: str,
    ds_name: str,
    layer_name: str,
    precision: str = "float32",
    to_collect: Sequence[str] = ("mom2",),
    batch_tokens: int = 3 * 1024,
    sample_size: Optional[int] = None,
) -> Path:
    """Cache path codec (reference layer_stats.py:166-174)."""
    size_suffix = "" if sample_size is None else f"_{sample_size}"
    size_suffix = f"_t{batch_tokens}" + size_suffix
    file_extension = (
        f"{model_name}/{ds_name}_stats/"
        f"{layer_name}_{precision}_{'-'.join(sorted(to_collect))}{size_suffix}.npz"
    )
    return Path(stats_dir) / file_extension


def _layer_index_from_name(layer_name: str) -> int:
    m = re.search(r"layers[._](\d+)", layer_name)
    if m is None:
        raise ValueError(f"cannot parse layer index from {layer_name!r}")
    return int(m.group(1))


def make_fc2_in_extractor(model, layer_index: int, dtype=jnp.float32):
    """jit'd partial forward: (params, ids, mask) → masked fc2 inputs
    (B, S, in_dim) with padded positions zeroed, plus real-token count."""

    @jax.jit
    def extract(params, input_ids, attention_mask):
        out = model.apply(
            {"params": params},
            input_ids,
            attention_mask,
            capture=("fc2_in",),
            stop_at_layer=layer_index,
        )
        feats = out.taps["fc2_in"][layer_index].astype(dtype)
        m = attention_mask.astype(dtype)[..., None]
        return feats * m, attention_mask.sum()

    return extract


def layer_stats_text_encoder(
    model,
    params,
    tokenizer,
    layer_name: str,
    stats_dir="data/stats",
    ds_name: str = "ccs_filtered",
    to_collect: Sequence[str] = ("mom2",),
    model_name: str = "text_encoder",
    sample_size: Optional[int] = None,
    precision: str = "float32",
    batch_tokens: int = 3 * 1024,
    batch_size: int = 100,
    captions: Optional[Sequence[str]] = None,
    force_recompute: bool = False,
    progress=None,
    max_length: Optional[int] = None,
    mesh=None,
) -> CombinedStat:
    """Load-or-compute cached stats for one layer's fc2 input.

    ``captions`` supplies the corpus (the reference auto-downloads the BLIP
    CCS captions, stat_dataset.py:83-88 — this build has no egress, so the
    corpus is user-provided or comes from emcid_tpu.dsets loaders).
    """
    filename = stats_filename(
        stats_dir, model_name, ds_name, layer_name, precision, to_collect,
        batch_tokens, sample_size,
    )
    stat = CombinedStat(**{k: STAT_TYPES[k]() for k in to_collect})

    if captions is None and not filename.exists():
        raise FileNotFoundError(
            f"stats cache {filename} missing and no caption corpus provided"
        )

    # Build fixed-shape caption batches (indices only; tokenized lazily).
    dataset = list(captions) if captions is not None else []
    loader = tally(
        stat,
        dataset,
        cache=(str(filename) if not force_recompute else None),
        sample_size=sample_size,
        batch_size=batch_size,
        random_sample=1,
        quiet=not bool(progress),
        collate_fn=lambda items: items,  # keep raw strings; tokenized below
    )

    layer_index = _layer_index_from_name(layer_name)
    extract = make_fc2_in_extractor(model, layer_index)
    max_length = max_length or tokenizer.model_max_length
    iterator = progress(loader) if progress else loader
    if mesh is not None:
        from emcid_tpu.parallel import pad_to_multiple, replicate, shard_batch

        params = replicate(params, mesh)
    for batch_texts in iterator:
        enc = tokenizer(batch_texts, padding="max_length", truncation=True,
                        max_length=max_length)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        # pad the caption batch to a fixed shape (the last batch is short;
        # zero-mask rows produce exactly-zero features, so they contribute
        # nothing to a^T a and only the count needs masking) — one compiled
        # program serves every batch, and the batch axis divides the mesh
        n_rows = batch_size
        if mesh is not None:
            n_rows = pad_to_multiple(max(n_rows, ids.shape[0]),
                                     mesh.devices.size)
        if ids.shape[0] < n_rows:
            pad = n_rows - ids.shape[0]
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
        if mesh is not None:
            ids_d = shard_batch(ids_d, mesh)
            mask_d = shard_batch(mask_d, mesh)
        feats, n_valid = extract(params, ids_d, mask_d)
        # masked/padded rows are exactly zero → contribute nothing to a^T a;
        # Mean/NormMean must only see real tokens, so gather on host only
        # when those stats are requested.
        if set(to_collect) == {"mom2"}:
            flat = feats.reshape(-1, feats.shape[-1])
            stat.mom2.add(flat, n_valid=int(n_valid))
        else:
            real = mask.reshape(-1).astype(bool)
            flat = np.asarray(feats).reshape(-1, feats.shape[-1])[real]
            stat.add(flat)
    return stat


def get_cov_text_encoder(
    model,
    params,
    tokenizer,
    layer_name: str,
    mom2_dataset: str = "ccs_filtered",
    mom2_n_samples: Optional[int] = None,
    mom2_dtype: str = "float32",
    stat_dir="data/stats",
    model_name: str = "text_encoder",
    captions: Optional[Sequence[str]] = None,
    inv: bool = False,
    force_recompute: bool = False,
    verbose: bool = True,
    mesh=None,
) -> jnp.ndarray:
    """Memoized covariance retrieval (reference emcid_main.py:2239-2276):
    returns ``mom2.moment()`` (the count-normalized second moment)."""
    key = (model_name, layer_name)
    if verbose:
        print(f"Retrieving covariance statistics for {model_name} @ {layer_name}.")
    if key not in COV_CACHE or force_recompute:
        stat = layer_stats_text_encoder(
            model, params, tokenizer, layer_name,
            stats_dir=stat_dir, ds_name=mom2_dataset,
            sample_size=mom2_n_samples, precision=mom2_dtype,
            captions=captions, force_recompute=force_recompute,
            model_name=model_name, mesh=mesh,
        )
        COV_CACHE[key] = np.asarray(stat.mom2.moment(), dtype=np.float32)
    C = jnp.asarray(COV_CACHE[key])
    return jnp.linalg.inv(C) if inv else C
