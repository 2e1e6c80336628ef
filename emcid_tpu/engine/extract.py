"""Batched activation extraction at subject-token positions.

Functional equivalent of the reference's ``get_module_input_output_at_words``
(compute_z.py:2252-2384) + ``compute_ks_text_encoder`` (compute_ks.py:21-41):
fc2 inputs ("keys") and outputs at each request's fact token(s), averaged
over the request's prompts.

TPU-first differences:
* ONE batched forward over all requests × prompts (static padded shapes)
  instead of a hooked forward per call site;
* token lookup is a device-side gather with per-prompt index arrays computed
  on host at batch-prep time;
* per-request prompt averaging is a segment-sum matmul (one-hot), so the
  whole extraction jits and shards.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.text.token_range import find_token_range


@dataclass
class RequestBatch:
    """Host-prepared static-shape batch for all requests' source prompts.

    P = total prompts, S = padded seq len, T = num fact tokens, R = requests.
    """

    input_ids: np.ndarray  # (P, S) int32
    attention_mask: np.ndarray  # (P, S) int32
    lookup_indices: np.ndarray  # (P, T) int32 — fact-token positions
    prompt_to_request: np.ndarray  # (P,) int32
    prompts_per_request: np.ndarray  # (R,) int32
    num_requests: int
    num_fact_tokens: int

    @property
    def seg_matrix(self) -> np.ndarray:
        """(R, P) averaging matrix: seg @ x averages prompts per request."""
        R, P = self.num_requests, len(self.prompt_to_request)
        m = np.zeros((R, P), dtype=np.float32)
        m[self.prompt_to_request, np.arange(P)] = 1.0
        m /= np.maximum(self.prompts_per_request, 1)[:, None]
        return m


def _request_prompts(request: Dict) -> Tuple[List[str], str]:
    """Expand a request to its source prompts (reference compute_z.py:2270-2282):
    ``source_prompts`` verbatim if present, else templates formatted with
    ``source``."""
    if "source_prompts" in request:
        return list(request["source_prompts"]), request["source"]
    return (
        [p.format(request["source"]) for p in request["prompts"]],
        request["source"],
    )


def prepare_request_batch(
    tokenizer,
    requests: Sequence[Dict],
    num_fact_tokens: int = 1,
    max_length: Optional[int] = None,
) -> RequestBatch:
    """Tokenize all requests' source prompts and locate fact tokens.

    fact tokens (reference compute_z.py:2292-2352): [last subject token] for
    ``num_fact_tokens == 1``; plus the EOS position and following pads for
    larger counts (matching num_edit_tokens semantics).
    """
    max_length = max_length or tokenizer.model_max_length
    prompts: List[str] = []
    subjects: List[str] = []
    prompt_to_request: List[int] = []
    for r, request in enumerate(requests):
        ps, subject = _request_prompts(request)
        prompts.extend(ps)
        subjects.extend([subject] * len(ps))
        prompt_to_request.extend([r] * len(ps))

    enc = tokenizer(prompts, padding="max_length", truncation=True,
                    max_length=max_length)
    input_ids, attention_mask = enc["input_ids"], enc["attention_mask"]

    P = len(prompts)
    lookup = np.zeros((P, num_fact_tokens), dtype=np.int32)
    for i in range(P):
        n_real = int(attention_mask[i].sum())
        _, end = find_token_range(tokenizer, input_ids[i, :n_real], subjects[i])
        lookup[i, 0] = end - 1
        if num_fact_tokens > 1:
            eos = n_real - 1
            extra = [min(eos + t, max_length - 1)
                     for t in range(num_fact_tokens - 1)]
            lookup[i, 1:] = extra

    counts = np.bincount(prompt_to_request, minlength=len(requests)).astype(np.int32)
    return RequestBatch(
        input_ids=np.asarray(input_ids, dtype=np.int32),
        attention_mask=np.asarray(attention_mask, dtype=np.int32),
        lookup_indices=lookup,
        prompt_to_request=np.asarray(prompt_to_request, dtype=np.int32),
        prompts_per_request=counts,
        num_requests=len(requests),
        num_fact_tokens=num_fact_tokens,
    )


def gather_at_tokens(acts: jnp.ndarray, lookup_indices: jnp.ndarray) -> jnp.ndarray:
    """(P, S, D), (P, T) → (P, T, D) gather of fact-token activations."""
    P = acts.shape[0]
    return acts[jnp.arange(P)[:, None], lookup_indices]


def per_request_mean(x: jnp.ndarray, seg_matrix: jnp.ndarray) -> jnp.ndarray:
    """(P, T, D), (R, P) → (R, T, D) prompt-mean per request (one matmul).

    precision pinned at the einsum itself (not a context decorator) so
    callers' jitted model programs keep their default trace context
    (runtime.pdot scope rule, ADVICE r4)."""
    return jnp.einsum("rp,ptd->rtd", seg_matrix, x,
                      precision=jax.lax.Precision.HIGHEST)


def module_io_at_words(
    model,
    params,
    batch: RequestBatch,
    layer: int,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fc2 (input, output) at fact tokens, prompt-averaged per request.

    Returns ``(keys (R, T, in_dim), values (R, T, out_dim))`` — the reference
    returns (R, D) squeezed for T == 1; callers here keep the T axis and
    reshape as needed.
    """
    seg = jnp.asarray(batch.seg_matrix)
    lookup = jnp.asarray(batch.lookup_indices)

    @jax.jit
    def run(params):
        out = model.apply(
            {"params": params},
            jnp.asarray(batch.input_ids),
            capture=("fc2_in", "fc2_out"),
            stop_at_layer=layer,
        )
        fc2_in = out.taps["fc2_in"][layer].astype(dtype)
        fc2_out = out.taps["fc2_out"][layer].astype(dtype)
        keys = per_request_mean(gather_at_tokens(fc2_in, lookup), seg)
        vals = per_request_mean(gather_at_tokens(fc2_out, lookup), seg)
        return keys, vals

    return run(params)


def compute_ks_text_encoder(model, params, tokenizer, requests, hparams,
                            layer: int) -> jnp.ndarray:
    """Stage-2 keys (reference compute_ks.py:21-41): fc2 *inputs* at the fact
    token(s), (R, T, in_dim)."""
    batch = prepare_request_batch(
        tokenizer, requests, num_fact_tokens=getattr(hparams, "num_edit_tokens", 1)
    )
    keys, _ = module_io_at_words(model, params, batch, layer)
    return keys
