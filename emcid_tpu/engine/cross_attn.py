"""Cross-attention K/V EMCID editing mode
(reference emcid_main.py:314-548 execute/apply_emcid_cross_attn;
compute_z.py:2407-2643 compute_z_unet_x_kv;
layer_stats.py:333-427 layer_stats_cross_attn_kv).

All 32 K/V projections of the SD UNet consume the *same* input — the text
encoder's final hidden states — so:

* Stage-2 keys need no UNet forward at all: ``K`` = the prompt-averaged
  text states at the fact tokens (the reference runs the UNet with dummy
  latents under hooks to observe the same values);
* the covariance is one statistic C = E[h h^T] over caption text states,
  shared by every projection (the reference caches it once per layer name);
* ``cur_z`` per projection is just ``K @ W^T``.

Stage-1 optimizes one delta per projection (added to that projection's
output at the fact-token rows) jointly under the diffusion noise loss, via
the UNet's ``inject`` seam.  Stage-2 solves per projection with NO residual
spreading (reference :448 ``resid = sources``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emcid_tpu.engine.extract import (
    RequestBatch,
    gather_at_tokens,
    per_request_mean,
    prepare_request_batch,
)
from emcid_tpu.engine.uce import get_unet_weight, set_unet_weight
from emcid_tpu.models.pipeline import SDComponents, encode_prompts
from emcid_tpu.models.scheduler import add_noise
from emcid_tpu.models.unet import cross_attn_kv_layer_names
from emcid_tpu.ops.solve import solve_adj_k, upd_matrix_match_shape
from emcid_tpu.runtime import pdot


def get_cross_attn_keys(
    components: SDComponents,
    requests: Sequence[Dict],
    num_fact_tokens: int = 1,
) -> Tuple[jnp.ndarray, RequestBatch]:
    """Prompt-averaged final text states at fact tokens: (R, T, H)."""
    batch = prepare_request_batch(components.tokenizer, requests,
                                  num_fact_tokens=num_fact_tokens)
    hidden = components.text_encoder.apply(
        {"params": components.text_params}, jnp.asarray(batch.input_ids)
    ).last_hidden_state
    keys = per_request_mean(
        gather_at_tokens(hidden.astype(jnp.float32),
                         jnp.asarray(batch.lookup_indices)),
        jnp.asarray(batch.seg_matrix),
    )
    return keys, batch


def layer_stats_cross_attn_kv(
    components: SDComponents,
    layer_name: str,
    captions: Optional[Sequence[str]] = None,
    stats_dir="data/stats",
    ds_name: str = "ccs_filtered",
    sample_size: Optional[int] = None,
    precision: str = "float32",
    batch_size: int = 64,
    force_recompute: bool = False,
):
    """Second moment of caption text states (the shared K/V input statistic),
    cached per layer name for drop-in parity with the reference's per-layer
    files (model_name='unet')."""
    from emcid_tpu.engine.layer_stats import stats_filename
    from emcid_tpu.stats import CombinedStat, SecondMoment, tally

    filename = stats_filename(stats_dir, "unet", ds_name, layer_name,
                              precision, ("mom2",), 3 * 1024, sample_size)
    stat = CombinedStat(mom2=SecondMoment())
    if captions is None and not filename.exists():
        raise FileNotFoundError(f"stats cache {filename} missing")
    loader = tally(stat, list(captions or []),
                   cache=(str(filename) if not force_recompute else None),
                   sample_size=sample_size, batch_size=batch_size,
                   random_sample=1, quiet=True,
                   collate_fn=lambda items: items)
    tok = components.tokenizer

    @jax.jit
    def extract(params, ids, mask):
        h = components.text_encoder.apply(
            {"params": params}, ids, mask
        ).last_hidden_state.astype(jnp.float32)
        return h * mask.astype(jnp.float32)[..., None]

    for texts in loader:
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=tok.model_max_length)
        feats = extract(components.text_params, jnp.asarray(enc["input_ids"]),
                        jnp.asarray(enc["attention_mask"]))
        flat = feats.reshape(-1, feats.shape[-1])
        stat.mom2.add(flat)
        stat.mom2.count -= flat.shape[0] - int(
            np.asarray(enc["attention_mask"]).sum())
    return stat


def compute_z_unet_x_kv(
    components: SDComponents,
    request: Dict,
    hparams,
    latents_mean: np.ndarray,
    latents_logvar: np.ndarray,
    rng: Optional[jax.Array] = None,
    mesh=None,
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
    """Jointly optimize one delta per K/V projection for a single concept
    (reference compute_z.py:2407-2643).

    Returns {layer_name: v_star (T, out_dim)} — the post-edit target output
    of each projection at the fact tokens.

    With ``mesh``, the UNet batch (prompt) axis shards over devices: the
    prompt set is tiled to lcm(P, n_devices) — random draws are made at the
    ORIGINAL prompt count and tiled, so every duplicate contributes the
    identical loss term and the trajectory equals the unsharded one exactly
    (sharded==unsharded test: tests/test_multichip_extra.py).
    """
    hp = hparams
    kv_names = cross_attn_kv_layer_names(components.unet.config)
    keys, batch = get_cross_attn_keys(components, [request],
                                      hp.num_edit_tokens)
    P0 = batch.input_ids.shape[0]
    S = batch.input_ids.shape[1]
    T = batch.num_fact_tokens
    reps = 1
    if mesh is not None:
        import math

        from emcid_tpu.parallel import replicate, shard_batch

        reps = math.lcm(P0, mesh.devices.size) // P0
    P = P0 * reps

    # token mask of fact tokens per prompt: (P0, S), tiled to (P, S)
    tok_mask = np.zeros((P0, S), np.float32)
    for p in range(P0):
        for t in range(T):
            tok_mask[p, batch.lookup_indices[p, t]] = 1.0
    tok_mask = jnp.asarray(np.tile(tok_mask, (reps, 1)))

    ctx_src = components.text_encoder.apply(
        {"params": components.text_params}, jnp.asarray(batch.input_ids)
    ).last_hidden_state
    # supervision contexts (reference compute_z.py:2536-2543): the
    # unconditional [""] representation always; the request's safe_words
    # under SLD supervision
    ctx_unc = jnp.asarray(encode_prompts(components, [""] * P0))
    sld = bool(getattr(hp, "sld_supervision", False))
    if sld:
        ctx_safe = jnp.asarray(encode_prompts(
            components, [request["safe_words"]] * P0))
        sld_type = getattr(hp, "sld_type", "max") or "max"
        if sld_type == "max":
            sld_gs, sld_thr = 5000.0, 1.0
        elif sld_type == "strong":
            sld_gs, sld_thr = 2000.0, 0.025
        else:
            raise ValueError(f"sld_type {sld_type} not supported")
    else:
        ctx_safe = ctx_unc  # unused placeholder, keeps data pytree static
        sld_gs = sld_thr = 0.0
        esd_mu = getattr(hp, "esd_mu", None)
        if hp.objective != "esd" or esd_mu in (None, "None"):
            raise ValueError(
                "compute_z_unet_x_kv supports only the reference's two "
                "supervision modes (compute_z.py:2583-2605): "
                "hparams.sld_supervision or objective='esd' with esd_mu")
    if reps > 1:
        ctx_src = jnp.tile(ctx_src, (reps, 1, 1))
        ctx_unc = jnp.tile(ctx_unc, (reps, 1, 1))
        ctx_safe = jnp.tile(ctx_safe, (reps, 1, 1))
        latents_mean = np.tile(np.asarray(latents_mean), (1, reps, 1, 1, 1))
        latents_logvar = np.tile(np.asarray(latents_logvar),
                                 (1, reps, 1, 1, 1))
    if mesh is not None:
        ctx_src = shard_batch(ctx_src, mesh)
        ctx_unc = shard_batch(ctx_unc, mesh)
        ctx_safe = shard_batch(ctx_safe, mesh)
        tok_mask = shard_batch(tok_mask, mesh)

    z0 = {
        name: pdot(keys[0], get_unet_weight(components.unet_params, name
                                            ).astype(jnp.float32).T)
        for name in kv_names
    }
    out_dims = {name: int(z0[name].shape[-1]) for name in kv_names}

    lat_mean = jnp.asarray(latents_mean)  # (Simg, P, h, w, c)
    lat_logvar = jnp.asarray(latents_logvar)
    schedule = components.schedule
    unet, pu = components.unet, components.unet_params
    if mesh is not None:
        pu = replicate(pu, mesh)

    opt = optax.adam(hp.v_lr)
    z0_norm = {name: jnp.linalg.norm(z0[name][0]) for name in kv_names}
    data = dict(ctx_src=ctx_src, ctx_unc=ctx_unc, ctx_safe=ctx_safe,
                tok_mask=tok_mask,
                lat_mean=lat_mean, lat_logvar=lat_logvar, z0n=z0_norm)

    # params and activations enter as jit ARGUMENTS: a closure-captured
    # UNet would be baked into the program as constants — 3.4 GB of
    # constants at SD shapes, observed to crash the remote compiler —
    # and the per-step float(loss) of the old loop paid one ~0.5 s
    # host round-trip per step on the tunneled backend
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def run_chunk(pu, data, carry, keys):
        def loss_fn(deltas, key):
            k_img, k_post, k_noise, k_t = jax.random.split(key, 4)
            # random training-image sample per prompt per step (reference
            # compute_z.py:2549-2555)
            Simg = data["lat_mean"].shape[0]
            img_idx = jax.random.randint(k_img, (P0,), 0, Simg)
            pr = jnp.arange(P0)
            mean = data["lat_mean"][img_idx, pr]
            logvar = data["lat_logvar"][img_idx, pr]
            # draws at the ORIGINAL prompt count, tiled — duplicates are
            # exact copies, so the sharded loss equals the unsharded one
            shape0 = (P0,) + mean.shape[1:]
            tile = lambda x: (jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))
                              if reps > 1 else x)
            latents = tile(mean) + tile(jnp.exp(0.5 * logvar)) * tile(
                jax.random.normal(k_post, shape0, mean.dtype))
            noise = tile(jax.random.normal(k_noise, shape0, mean.dtype))
            timesteps = tile(jax.random.randint(
                k_t, (P0,), 0, schedule.num_train_timesteps))
            noisy = add_noise(schedule, latents, noise, timesteps)
            inject = {
                name: data["tok_mask"][..., None] * d[None, None, :]
                for name, (d,) in deltas.items()
            }

            @jax.checkpoint
            def unet_fwd_inject(ctx):
                return unet.apply({"params": pu}, noisy, timesteps, ctx,
                                  inject=inject).sample

            @jax.checkpoint
            def unet_fwd_plain(ctx):
                return unet.apply({"params": pu}, noisy, timesteps,
                                  ctx).sample

            eps_edit = unet_fwd_inject(data["ctx_src"])
            # supervision target (reference compute_z.py:2578-2605):
            # unedited-model forwards, stop-gradient
            pred_src = jax.lax.stop_gradient(unet_fwd_plain(data["ctx_src"]))
            pred_unc = jax.lax.stop_gradient(unet_fwd_plain(data["ctx_unc"]))
            if sld:
                pred_safe = jax.lax.stop_gradient(
                    unet_fwd_plain(data["ctx_safe"]))
                scale = jnp.minimum(
                    jnp.abs(pred_src - pred_safe) * sld_gs, 1.0)
                safety_scale = jnp.where(pred_src - pred_safe >= sld_thr,
                                         jnp.zeros_like(scale), scale)
                supervision = pred_src - (pred_safe - pred_unc) * safety_scale
            else:
                mu = float(esd_mu)
                supervision = pred_unc - mu * (pred_src - pred_unc)
            mse = jnp.mean((eps_edit - supervision) ** 2)
            reg = sum(
                hp.v_weight_decay * jnp.sqrt(jnp.sum(d**2) + 1e-12)
                / (data["z0n"][name] ** 2)
                for name, (d,) in deltas.items()
            )
            # reference: loss = mse + weight_decay / len(layer_names)
            # (compute_z.py:2618)
            return mse + reg / len(kv_names)

        def step(carry, key):
            deltas, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(deltas, key)
            updates, opt_state = opt.update(grads, opt_state, deltas)
            deltas = optax.apply_updates(deltas, updates)
            # per-layer L2 clamp vs |z0|
            deltas = {
                name: (jnp.where(
                    jnp.linalg.norm(d) > hp.clamp_norm_factor
                    * data["z0n"][name],
                    d * hp.clamp_norm_factor * data["z0n"][name]
                    / jnp.maximum(jnp.linalg.norm(d), 1e-12),
                    d,
                ),)
                for name, (d,) in deltas.items()
            }
            return (deltas, opt_state), loss

        return jax.lax.scan(step, carry, keys)

    deltas0 = {name: (jnp.zeros((out_dims[name],), jnp.float32),)
               for name in kv_names}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    all_keys = jax.random.split(rng, hp.v_num_grad_steps)
    # host-chunked for the tunnel watchdog (same pattern as ZOptimizer.run)
    import os as _os

    chunk = max(1, min(int(_os.environ.get("EMCID_TPU_Z_CHUNK", 20)),
                       hp.v_num_grad_steps or 1))
    if jax.default_backend() not in ("cpu",):
        try:
            from emcid_tpu.profiling import unet_fwd_flops

            hw = lat_mean.shape[-2]
            est_s = 3.0 * unet_fwd_flops(unet.config, P, hw) / 50e12
            chunk = max(1, min(chunk, int(15.0 / max(est_s, 1e-3))))
        except Exception:
            pass
    carry = (deltas0, opt.init(deltas0))
    losses = []
    for start in range(0, hp.v_num_grad_steps, chunk):
        keys = all_keys[start:start + chunk]
        carry, chunk_losses = run_chunk(pu, data, carry, keys)
        np.asarray(chunk_losses[-1])  # surface device faults here
        losses.extend(np.asarray(chunk_losses).tolist())
    deltas, _ = carry
    if verbose and losses:
        print(f"x-kv z opt: loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    return {
        name: np.asarray(z0[name] + deltas[name][0][None, :])
        for name in kv_names
    }


def execute_emcid_cross_attn(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    zs_dict: Dict[str, np.ndarray],
    cov,
    mom2_weight=None,
    edit_weight=None,
    verbose: bool = True,
) -> Tuple[Dict[str, Tuple[np.ndarray, np.ndarray]], SDComponents]:
    """Per-projection closed-form insert (reference emcid_main.py:314-508).

    zs_dict: {layer_name: (R, T, out_dim)} targets; ``cov``: the shared
    text-state second moment (one matrix — or a {layer_name: C} dict for
    per-layer caches).
    """
    lam = float(mom2_weight if mom2_weight is not None else hparams.mom2_update_weight)
    alpha = float(edit_weight if edit_weight is not None else hparams.edit_weight)
    kv_names = cross_attn_kv_layer_names(components.unet.config)
    keys, _ = get_cross_attn_keys(components, requests,
                                  hparams.num_edit_tokens)
    K = keys.reshape(-1, keys.shape[-1]).T.astype(jnp.float32)  # (H, N)
    k_scale = (alpha / 0.5) ** 0.5
    cov_scale = (1.0 - alpha) / 0.5
    K_s = K * k_scale

    deltas: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    new_params = components.unet_params
    adj_cache: Dict[int, jnp.ndarray] = {}
    for name in kv_names:
        C = cov[name] if isinstance(cov, dict) else cov
        C = jnp.asarray(C, jnp.float32) * cov_scale
        ck = id(cov[name]) if isinstance(cov, dict) else 0
        if ck not in adj_cache:
            adj_cache[ck] = jnp.asarray(
                solve_adj_k(C, K_s, lam, method="f32_ir")
            )
        adj_k = adj_cache[ck]
        w = get_unet_weight(components.unet_params, name).astype(jnp.float32)
        # f32 closed-form dots pinned per-site (runtime.pdot, ADVICE r4)
        cur_z = pdot(keys.reshape(-1, keys.shape[-1]), w.T).T  # (out, N)
        zs = jnp.asarray(zs_dict[name]).reshape(-1, w.shape[0]).T
        sources = (zs.astype(jnp.float32) - cur_z) * k_scale
        upd = pdot(sources, adj_k.T)
        upd = upd_matrix_match_shape(upd, w.shape)
        new_params = set_unet_weight(new_params, name, w + upd)
        deltas[f"{name}.weight"] = (np.asarray(adj_k), np.asarray(sources))
        if verbose:
            print(f"{name}: z error "
                  f"{float(jnp.linalg.norm(sources / k_scale, axis=0).mean()):.4f}, "
                  f"upd norm {float(jnp.linalg.norm(upd)):.4f}")
    return deltas, components.replace_unet_params(new_params)


def apply_emcid_to_cross_attn(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    latents_mean=None,
    latents_logvar=None,
    cov=None,
    captions: Optional[Sequence[str]] = None,
    cache_name: Optional[str] = None,
    mom2_weight=None,
    edit_weight=None,
    mesh=None,
    verbose: bool = True,
):
    """Stage-1 per concept (with per-layer v_star npz cache,
    ``source_{s}.npz`` holding one array per layer name) + Stage-2."""
    kv_names = cross_attn_kv_layer_names(components.unet.config)
    if cov is None:
        stat = layer_stats_cross_attn_kv(
            components, kv_names[0], captions=captions,
            sample_size=len(captions or []) or None,
        )
        cov = np.asarray(stat.mom2.moment(), np.float32)

    zs_dict: Dict[str, List[np.ndarray]] = {n: [] for n in kv_names}
    for idx, request in enumerate(requests):
        cached = None
        cache_full = (Path(f"{cache_name}source_{request['source']}.npz")
                      if cache_name else None)
        if cache_full is not None and cache_full.exists():
            try:
                data = np.load(cache_full)
                cached = {n: data[n] for n in kv_names}
            except Exception as e:
                print(f"Error reading cache file due to {e}. Recomputing...")
        if cached is None:
            if latents_mean is None:
                raise ValueError("latents required to compute x-kv z targets")
            cached = compute_z_unet_x_kv(
                components, request, hparams,
                np.asarray(latents_mean)[idx], np.asarray(latents_logvar)[idx],
                mesh=mesh, verbose=verbose,
            )
            if cache_full is not None:
                cache_full.parent.mkdir(exist_ok=True, parents=True)
                np.savez(cache_full, **cached)
        for n in kv_names:
            zs_dict[n].append(np.asarray(cached[n]))
    zs_stacked = {n: np.stack(v) for n, v in zs_dict.items()}
    return execute_emcid_cross_attn(
        components, requests, hparams, zs_stacked, cov,
        mom2_weight=mom2_weight, edit_weight=edit_weight, verbose=verbose,
    )
