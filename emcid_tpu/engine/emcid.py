"""Stage-2: MEMIT-style multi-layer closed-form insert (the core engine).

Algorithm parity with the reference ``execute_emcid_text_encoder``
(emcid_main.py:818-1082):

  for the i-th edited layer (ordered):
    K   = fc2 inputs at fact tokens, prompt-averaged        (in_dim, N)
    cur = fc2 outputs at fact tokens, prompt-averaged       (out_dim, N)
    C  *= (1 - alpha)/0.5;  K, (zs - cur) *= sqrt(alpha/0.5)    [edit_weight]
    adj_k = solve(lam*C + K K^T, K)
    resid = (zs - cur) / (L - i)                      [residual spreading]
    W_i  += resid @ adj_k^T
  deltas[layer] = (adj_k, resid)         [factor-pair delta format]

TPU-first redesign: the reference re-runs a full text-encoder forward per
edited layer on the partially-edited model (emcid_main.py:981-1004) — O(L)
full forwards.  Because the fc2 edit is linear, its effect on the layer
output is exactly ``fc2_in @ upd^T``; so we stream the whole request batch
through the layer stack ONCE, and at each edited layer solve, update, and
patch the running hidden state in place:

    h <- h + fc2_in @ upd^T

which reproduces the reference's per-layer recomputation exactly (the edit
at layer i only enters later layers through h).  The entire multi-layer
insert — embeddings, layer walk, Cholesky solves, weight updates — is one
jit-compiled XLA program (``solve_method="f32_ir"``), or a python-stepped
host-f64 loop for parity runs (``solve_method="f64"``).

Invariant kept from the reference (emcid_main.py:159, 830): ``execute``
never mutates the caller's params — params are a functional pytree; the
updated pytree is returned alongside the deltas.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from emcid_tpu.engine.extract import (
    RequestBatch,
    gather_at_tokens,
    per_request_mean,
    prepare_request_batch,
)
from emcid_tpu.models.clip_text import causal_attention_mask
from emcid_tpu.models.naming import get_weight, set_weight
from emcid_tpu.ops.solve import solve_adj_k, upd_matrix_match_shape


def z_cache_path(cache_name: str, request: Dict, hparams=None,
                 idx: Optional[int] = None) -> Path:
    """Per-concept z cache path (reference emcid_main.py:871-907):
    ``{cache_name}source_{source}_dest_{dest}.npz`` (key "v_star");
    esd objective omits the dest; SLD-supervised (global-concept) requests
    key on ``source_{source_cat}_{idx}`` (reference :879-884)."""
    if hparams is not None and "esd" in getattr(hparams, "objective", ""):
        return Path(f"{cache_name}source_{request['source']}.npz")
    if hparams is not None and getattr(hparams, "sld_supervision", False):
        return Path(
            f"{cache_name}source_{request['source_cat']}_{idx}.npz"
        )
    return Path(
        f"{cache_name}source_{request['source']}_dest_{request['dest']}.npz"
    )


def load_z_list(
    requests: Sequence[Dict],
    cache_name: Optional[str],
    hparams=None,
) -> Tuple[List[Optional[np.ndarray]], List[int]]:
    """Load cached per-concept z vectors; returns (z_or_None list, missing idx)."""
    zs: List[Optional[np.ndarray]] = []
    missing: List[int] = []
    for i, request in enumerate(requests):
        z = None
        if cache_name is not None:
            p = z_cache_path(cache_name, request, hparams, idx=i)
            if p.exists():
                try:
                    z = np.load(p)["v_star"]
                except Exception as e:  # corrupt cache → recompute (ref :902-904)
                    print(f"Error reading cache file due to {e}. Recomputing...")
        zs.append(z)
        if z is None:
            missing.append(i)
    return zs, missing


def save_z_cache(cache_name: str, request: Dict, z: np.ndarray, hparams=None,
                 idx: Optional[int] = None):
    p = z_cache_path(cache_name, request, hparams, idx=idx)
    p.parent.mkdir(exist_ok=True, parents=True)
    np.savez(p, v_star=np.asarray(z))


def _solve_inline(C, K, lam, refine_steps=2):
    """f32 Cholesky + iterative refinement for the one-pass insert program
    (ops.solve._solve_f32_ir; the nested jit inlines into the caller's
    trace, so the fused single-program property is unchanged)."""
    from emcid_tpu.ops.solve import _solve_f32_ir

    return _solve_f32_ir(C, K, lam, refine_steps=refine_steps)


# Compiled one-pass insert programs, keyed by (model config, dtype, edit
# layers, solve method) so repeated edits — sweeps over mom2_weight /
# edit_weight / request sets of the same shape — reuse the same XLA
# executable (lam/alpha enter as device scalars, not compile-time consts).
_ONE_PASS_CACHE: Dict[Any, Callable] = {}


def _get_one_pass(model, layers: Tuple[int, ...], solve_method: str,
                  refine_steps: int = 2) -> Callable:
    key = (model.config, str(model.dtype), layers, solve_method, refine_steps)
    if key in _ONE_PASS_CACHE:
        return _ONE_PASS_CACHE[key]

    n_spread = len(layers)
    max_layer = max(layers)

    def one_pass(params, ids, lookup, seg, zs_t, covs, lam, k_scale, cov_scale):
        """Walk the stack once; solve+patch at each edited layer.

        covs: (n_layers, in, in) stacked; lam/k_scale/cov_scale: f32 scalars.
        Returns stacked (upds, adjs, resids, z_errs).
        """
        h = model.apply({"params": params}, ids, method="embed")
        mask = causal_attention_mask(ids.shape[1])
        upds, adjs, resids, z_errs = [], [], [], []
        for i in range(max_layer + 1):
            h, fc2_in, fc2_out = model.apply(
                {"params": params}, h, mask, i, method="layer_forward"
            )
            if i not in layers:
                continue
            j = layers.index(i)
            ks = per_request_mean(gather_at_tokens(fc2_in, lookup), seg)
            cur = per_request_mean(gather_at_tokens(fc2_out, lookup), seg)
            K = ks.reshape(-1, ks.shape[-1]).T.astype(jnp.float32) * k_scale
            src = (zs_t - cur.reshape(-1, cur.shape[-1]).T.astype(jnp.float32)) * k_scale
            z_errs.append(jnp.linalg.norm(src, axis=0).mean() / k_scale)
            C = covs[j] * cov_scale
            if solve_method == "f32_ir":
                adj_k = _solve_inline(C, K, lam, refine_steps)
            else:  # pragma: no cover — f64 runs through the python path
                raise NotImplementedError
            resid = src / (n_spread - j)
            upd = jnp.dot(resid, adj_k.T, preferred_element_type=jnp.float32)
            # patch the running hidden state: the fc2 edit adds
            # fc2_in @ upd^T to this layer's output at every position
            h = h + jnp.einsum(
                "psi,oi->pso", fc2_in.astype(jnp.float32), upd
            ).astype(h.dtype)
            upds.append(upd)
            adjs.append(adj_k)
            resids.append(resid)
        return (
            jnp.stack(upds), jnp.stack(adjs), jnp.stack(resids), jnp.stack(z_errs)
        )

    # precise_matmuls: the insert's f32 closed-form math (K/resid dots,
    # the fc2_in @ upd^T hidden-state patch) must not drop to the TPU's
    # default bf16-rounded f32 matmul pass (runtime.precise_matmuls)
    from emcid_tpu.runtime import precise_matmuls

    fn = (jax.jit(precise_matmuls(one_pass)) if solve_method == "f32_ir"
          else precise_matmuls(one_pass))
    _ONE_PASS_CACHE[key] = fn
    return fn


def _one_pass_host_f64(model, params, ids, lookup, seg, zs_t, covs, layers,
                       lam, k_scale, cov_scale):
    """Parity path: same single-pass walk, host float64 solves per layer
    (matches the reference's torch.linalg.solve in double precision,
    emcid_main.py:1040-1048)."""
    h = model.apply({"params": params}, ids, method="embed")
    mask = causal_attention_mask(ids.shape[1])
    upds, adjs, resids, z_errs = [], [], [], []
    n_spread = len(layers)
    for i in range(max(layers) + 1):
        h, fc2_in, fc2_out = model.apply(
            {"params": params}, h, mask, i, method="layer_forward"
        )
        if i not in layers:
            continue
        j = layers.index(i)
        ks = per_request_mean(gather_at_tokens(fc2_in, lookup), seg)
        cur = per_request_mean(gather_at_tokens(fc2_out, lookup), seg)
        K = np.asarray(ks.reshape(-1, ks.shape[-1]).T, dtype=np.float64) * k_scale
        src = (
            np.asarray(zs_t, dtype=np.float64)
            - np.asarray(cur.reshape(-1, cur.shape[-1]).T, dtype=np.float64)
        ) * k_scale
        z_errs.append(np.linalg.norm(src, axis=0).mean() / k_scale)
        C = np.asarray(covs[j], dtype=np.float64) * cov_scale
        adj_k = solve_adj_k(C, K, lam, method="f64")
        resid = src / (n_spread - j)
        upd = resid @ adj_k.T
        h = h + jnp.einsum(
            "psi,oi->pso", fc2_in.astype(jnp.float32),
            jnp.asarray(upd, dtype=jnp.float32),
        ).astype(h.dtype)
        upds.append(jnp.asarray(upd, dtype=jnp.float32))
        adjs.append(jnp.asarray(adj_k, dtype=jnp.float32))
        resids.append(jnp.asarray(resid, dtype=jnp.float32))
    return upds, adjs, resids, z_errs


def execute_emcid_text_encoder(
    model,
    params,
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    *,
    zs: jnp.ndarray,
    covs: Sequence[jnp.ndarray],
    mom2_weight: Optional[float] = None,
    edit_weight: Optional[float] = None,
    solve_method: str = "f32_ir",
    batch: Optional[RequestBatch] = None,
    verbose: bool = True,
) -> Tuple[Dict[str, Tuple[np.ndarray, np.ndarray]], Dict[str, Any]]:
    """Compute the closed-form multi-layer edit.

    Args:
        zs: (R, T, out_dim) or (R*T, out_dim) Stage-1 target representations
            for the *last* hparams layer.
        covs: per-edited-layer second-moment matrices C (in_dim, in_dim),
            order matching ``hparams.layers``.
        solve_method: "f32_ir" = fully fused on-device program;
            "f64" = python-stepped with host float64 solves (parity mode).

    Returns:
        (deltas, new_params): deltas maps ``{rewrite_module}.weight`` →
        ``(adj_k (in,N), resid (out,N))`` numpy factor pairs (the reference's
        delta format, emcid_main.py:1060-1065); new_params is the edited
        pytree (caller keeps the original for restore).
    """
    lam = float(mom2_weight if mom2_weight is not None else hparams.mom2_update_weight)
    alpha = float(edit_weight if edit_weight is not None else hparams.edit_weight)
    layers: List[int] = list(hparams.layers)
    if layers != sorted(set(layers)):
        # the one-pass walk visits layers in ascending model order but
        # positions residual divisors / covs by LIST order — out-of-order
        # or duplicate layers would silently pair them wrong
        raise ValueError(
            f"hparams.layers must be strictly ascending, got {layers}")
    n_spread = len(layers)

    if batch is None:
        batch = prepare_request_batch(
            tokenizer, requests, num_fact_tokens=getattr(hparams, "num_edit_tokens", 1)
        )
    zs = jnp.asarray(zs)
    if zs.ndim == 3:
        zs = zs.reshape(-1, zs.shape[-1])  # (R*T, out) rq-major
    zs_t = zs.T.astype(jnp.float32)  # (out, N)

    ids = jnp.asarray(batch.input_ids)
    lookup = jnp.asarray(batch.lookup_indices)
    seg = jnp.asarray(batch.seg_matrix)
    k_scale = (alpha / 0.5) ** 0.5
    cov_scale = (1.0 - alpha) / 0.5

    if solve_method == "f32_ir":
        covs_stacked = jnp.stack(
            [jnp.asarray(c, dtype=jnp.float32) for c in covs]
        )
        one_pass = _get_one_pass(model, tuple(layers), solve_method)
        upds, adjs, resids, z_errs = one_pass(
            params, ids, lookup, seg, zs_t, covs_stacked,
            jnp.float32(lam), jnp.float32(k_scale), jnp.float32(cov_scale),
        )
    else:
        upds, adjs, resids, z_errs = _one_pass_host_f64(
            model, params, ids, lookup, seg, zs_t, covs, layers,
            lam, k_scale, cov_scale,
        )

    deltas: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    new_params = params
    for j, layer in enumerate(layers):
        w_name = f"{hparams.rewrite_module_tmp.format(layer)}.weight"
        mod_name = hparams.rewrite_module_tmp.format(layer)
        w = get_weight(params, mod_name)
        upd = upd_matrix_match_shape(upds[j], w.shape)
        new_params = set_weight(new_params, mod_name, w + upd)
        deltas[w_name] = (np.asarray(adjs[j]), np.asarray(resids[j]))
        if verbose:
            print(
                f"LAYER {layer}: wrote {adjs[j].shape[1]} key/value pair(s); "
                f"z error {float(z_errs[j]):.4f}; "
                f"upd norm {float(jnp.linalg.norm(upd)):.4f}"
            )
    return deltas, new_params


def apply_deltas_to_params(params, deltas, rewrite_module_tmp_unused=None):
    """Re-apply factor-pair deltas: ``W += key @ val^T`` oriented to W
    (reference apply_emcid_to_text_encoder, emcid_main.py:802-809)."""
    new_params = params
    for w_name, (key_mat, val_mat) in deltas.items():
        mod_name = w_name[: -len(".weight")]
        w = get_weight(params, mod_name)
        upd = jnp.asarray(key_mat) @ jnp.asarray(val_mat).T
        upd = upd_matrix_match_shape(upd, w.shape)
        new_params = set_weight(new_params, mod_name, w + upd)
    return new_params


def apply_emcid_to_text_encoder(
    model,
    params,
    tokenizer,
    requests: Sequence[Dict],
    hparams,
    *,
    zs: Optional[jnp.ndarray] = None,
    covs: Optional[Sequence[jnp.ndarray]] = None,
    compute_z_fn: Optional[Callable] = None,
    cov_fn: Optional[Callable[[int], jnp.ndarray]] = None,
    cache_name: Optional[str] = None,
    mom2_weight: Optional[float] = None,
    edit_weight: Optional[float] = None,
    solve_method: str = "f32_ir",
    verbose: bool = True,
    return_orig_params: bool = False,
):
    """User-facing edit (reference apply_emcid_to_text_encoder,
    emcid_main.py:769-815): resolve zs (cache → Stage-1 compute), resolve
    covariances, execute, return edited params (+ the pristine originals —
    "restore" in a functional world is just keeping the old pytree).
    """
    if zs is None:
        z_list, missing = load_z_list(requests, cache_name, hparams)
        if missing:
            if compute_z_fn is None:
                raise ValueError(
                    f"{len(missing)} request(s) lack cached z vectors and no "
                    "compute_z_fn was provided"
                )
            computed = compute_z_fn([requests[i] for i in missing])
            for k, i in enumerate(missing):
                z_list[i] = np.asarray(computed[k])
                if cache_name is not None:
                    # idx must match load_z_list's z_cache_path(..., idx=i):
                    # SLD-supervised requests key on source_{cat}_{idx}
                    save_z_cache(cache_name, requests[i], z_list[i], hparams,
                                 idx=i)
        zs = jnp.asarray(np.stack(z_list))
        if zs.ndim == 2:
            zs = zs[:, None, :]

    if covs is None:
        if cov_fn is None:
            raise ValueError("either covs or cov_fn must be provided")
        covs = [cov_fn(layer) for layer in hparams.layers]

    deltas, new_params = execute_emcid_text_encoder(
        model, params, tokenizer, requests, hparams,
        zs=zs, covs=covs, mom2_weight=mom2_weight, edit_weight=edit_weight,
        solve_method=solve_method, verbose=verbose,
    )
    if verbose:
        print(f"New weights successfully inserted into {list(deltas.keys())}")
    if return_orig_params:
        return new_params, deltas, params
    return new_params, deltas
