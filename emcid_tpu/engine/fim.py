"""Fisher information for EWC regularization (reference emcid/fim_cal.py:33-188).

Per (image, caption) pair: pick a random non-special token, form
``adj_k = solve(lam*C + k1 k1^T, k1)`` from its fc2-input key and the cached
covariance, set ``right_vec = adj_k`` (the 1^T @ adj_k^T contraction for
batch 1); then over ``t_steps_per_pair`` random (noise, timestep) draws,
backprop the diffusion MSE to the fc2 weight and accumulate

    grad_z = (dL/dW)^T @ right_vec        in R^{out_dim}
    FIM   += grad_z ** 2                  (Mean statistic)

TPU-first: dL/dW followed by the right_vec contraction is algebraically
``dL/d(delta)`` for a delta injected at the token positions weighted by
``fc2_in @ right_vec`` — but we keep the reference's exact factorization
(weight-gradient then contraction) computed with jax.grad w.r.t. the single
fc2 kernel; steps run inside one jit'd scan per pair.  npz cache codec
``{module}_{precision}_mean_step{T}_{N}.npz`` matches the reference path
consumed at compute_z.py:478-486.
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.naming import get_weight, torch_name_to_flax_path
from emcid_tpu.models.scheduler import add_noise
from emcid_tpu.ops.solve import solve_adj_k
from emcid_tpu.stats import CombinedStat, Mean, tally


def fim_filename(stats_dir, model_name, ds_name, module_name,
                 precision="float32", t_steps=10, sample_size=None) -> Path:
    size_suffix = "" if sample_size is None else f"_{sample_size}"
    return Path(stats_dir) / (
        f"{model_name}/{ds_name}_stats/"
        f"{module_name}_{precision}_mean_step{t_steps}{size_suffix}.npz"
    )


def fim_stats(
    components,
    module_name: str,
    pairs: Sequence[Tuple[np.ndarray, str]],
    cov: np.ndarray,
    mom2_weight: float = 4000,
    t_steps_per_pair: int = 10,
    stats_dir="data/fim_stats",
    ds_name: str = "ccs_filtered",
    model_name: str = "text_encoder",
    precision: str = "float32",
    sample_size: Optional[int] = None,
    rng_seed: int = 0,
    force_recompute: bool = False,
    verbose: bool = False,
) -> CombinedStat:
    """Compute/load the FIM Mean statistic.

    pairs: (image [-1,1] NHWC, caption) tuples (the reference's
    ImgTxtRndintDataset rows); ``cov`` is the fc2 covariance C.
    """
    filename = fim_filename(stats_dir, model_name, ds_name, module_name,
                            precision, t_steps_per_pair, sample_size)
    stat = CombinedStat(mean=Mean())
    loader = tally(
        stat, list(pairs),
        cache=(str(filename) if not force_recompute else None),
        sample_size=sample_size, batch_size=1, random_sample=1,
        quiet=not verbose, collate_fn=lambda items: items[0],
    )

    text = components.text_encoder
    tok = components.tokenizer
    flax_path = torch_name_to_flax_path(module_name)
    layer_idx = int(module_name.split("layers.")[1].split(".")[0])

    key = jax.random.PRNGKey(rng_seed)
    n_train_ts = components.schedule.num_train_timesteps
    acp = components.schedule

    @partial(jax.jit, static_argnames=())
    def pair_fim(text_params, unet_params, vae_params, input_ids, right_vec,
                 image, key):
        dist = components.vae.apply({"params": vae_params}, image[None],
                                    method="encode")
        k_post, key = jax.random.split(key)
        latents = dist.sample(k_post) * components.scaling_factor

        def weight_loss(w, noise, timesteps):
            # swap in the weight ((out, in) torch-oriented) functionally so
            # jax.grad targets it alone
            from emcid_tpu.models.naming import set_weight

            params2 = set_weight(text_params, module_name, w)
            txt = text.apply({"params": params2}, input_ids).last_hidden_state
            noisy = add_noise(acp, latents, noise, timesteps)
            pred = components.unet.apply(
                {"params": unet_params}, noisy, timesteps, txt
            ).sample
            return jnp.mean((pred - noise) ** 2)

        w0 = get_weight(text_params, module_name)  # (out, in)

        def step(carry, step_key):
            k_n, k_t = jax.random.split(step_key)
            noise = jax.random.normal(k_n, latents.shape, latents.dtype)
            timesteps = jax.random.randint(k_t, (1,), 0, n_train_ts)
            gW = jax.grad(weight_loss)(w0, noise, timesteps)  # (out, in)
            grad_z = gW @ right_vec  # (out,)
            return carry, grad_z**2

        _, sq = jax.lax.scan(step, None,
                             jax.random.split(key, t_steps_per_pair))
        return sq  # (T, out)

    for img, caption in loader:
        enc = tok([caption], padding="max_length", truncation=True,
                  max_length=tok.model_max_length)
        ids = jnp.asarray(enc["input_ids"])
        n_real = int(np.asarray(enc["attention_mask"][0]).sum())
        key, k_tok, k_pair = jax.random.split(key, 3)
        token_idx = int(jax.random.randint(k_tok, (), 1, max(n_real - 1, 2)))
        # k1 = fc2 input at the chosen token
        out = text.apply({"params": components.text_params}, ids,
                         capture=("fc2_in",), stop_at_layer=layer_idx)
        k1 = np.asarray(out.taps["fc2_in"][layer_idx][0, token_idx])[:, None]
        adj_k = solve_adj_k(np.asarray(cov), k1, mom2_weight, method="f64")
        right_vec = jnp.asarray(adj_k[:, 0], dtype=jnp.float32)  # (in,)

        img_arr = jnp.asarray(np.asarray(img, dtype=np.float32))
        sq = pair_fim(components.text_params, components.unet_params,
                      components.vae_params, ids, right_vec, img_arr, k_pair)
        stat.add(np.asarray(sq, dtype=precision))
    return stat


def make_fim_pairs(components, captions: Sequence[str], seed: int = 0,
                   num_inference_steps: int = 25, sampler: str = "dpm++",
                   height: int = 512, width: int = 512,
                   batch_size: Optional[int] = None, mesh=None):
    """(image [-1,1] NHWC, caption) pairs by generating each caption with the
    frozen pipeline — the offline analogue of the reference's downloaded CCS
    image subset (stat_dataset.py:175-229; no egress in this build)."""
    from emcid_tpu.models.pipeline import generate

    captions = list(captions)
    imgs = generate(
        components, captions, [seed + i for i in range(len(captions))],
        batch_size=batch_size, mesh=mesh,
        num_inference_steps=num_inference_steps, sampler=sampler,
        height=height, width=width,
    )
    arr = imgs.astype(np.float32) / 255.0 * 2.0 - 1.0
    return list(zip(arr, captions))


def resolve_fim(
    components,
    hparams,
    cov: np.ndarray,
    fim_dir="data/fim_stats",
    captions: Optional[Sequence[str]] = None,
    mesh=None,
    verbose: bool = True,
) -> np.ndarray:
    """FIM diag for ``hparams.use_ewc``: npz cache → compute over generated
    pairs.

    Cache lookup order matches the reference's consumption path
    (compute_z.py:478-486 hard-codes
    ``data/fim_stats/text_encoder/ccs_filtered_stats/
    text_model.encoder.layers.10.mlp.fc2_float32_mean_step10_3000.npz``):
    the edit layer's file at the reference's (step10, 3000) point, then the
    un-sized codec, then the reference's literal layer-10 file so a stats
    bundle copied from the reference checkout works unchanged.
    """
    layer = hparams.layers[-1]
    module_name = hparams.rewrite_module_tmp.format(layer)
    ds = getattr(hparams, "mom2_dataset", "ccs_filtered")
    n_pairs = int(os.environ.get("EMCID_TPU_FIM_PAIRS", 64))
    candidates = [
        fim_filename(fim_dir, "text_encoder", ds, module_name,
                     "float32", 10, 3000),
        fim_filename(fim_dir, "text_encoder", ds, module_name,
                     "float32", 10, None),
        fim_filename(fim_dir, "text_encoder", ds, module_name,
                     "float32", 10, n_pairs),
        fim_filename(fim_dir, "text_encoder", "ccs_filtered",
                     hparams.rewrite_module_tmp.format(10),
                     "float32", 10, 3000),
    ]
    for path in candidates:
        if Path(path).exists():
            if verbose:
                print(f"[emcid_tpu] EWC: loading FIM from {path}")
            return load_fim(path)

    if verbose:
        print(
            f"[emcid_tpu] EWC: no FIM cache at {candidates[0]} — computing "
            f"over {n_pairs} generated (image, caption) pairs (reference "
            "fidelity point is 3000 downloaded CCS pairs; set "
            "EMCID_TPU_FIM_PAIRS or pre-cache with engine.fim.fim_stats)"
        )
    if captions is None:
        from emcid_tpu.dsets.stat_dataset import make_synthetic_captions

        captions = make_synthetic_captions(n_pairs)
    captions = list(captions)[:n_pairs]
    res = components.unet.config.sample_size * components.vae_scale
    steps = 4 if res < 256 else 25  # tiny smoke pipelines sample in 4 steps
    pairs = make_fim_pairs(components, captions, height=res, width=res,
                           num_inference_steps=steps, mesh=mesh)
    stat = fim_stats(
        components, module_name, pairs, cov,
        mom2_weight=getattr(hparams, "mom2_update_weight", 4000),
        stats_dir=fim_dir, ds_name=ds, sample_size=len(pairs),
        verbose=verbose,
    )
    return np.asarray(stat.mean.mean())


def load_fim(path) -> np.ndarray:
    """Load a FIM Mean npz (the hard-coded consumption path,
    reference compute_z.py:478-486)."""
    from emcid_tpu.stats import unbox_numpy_null

    stat = CombinedStat(mean=Mean())
    data = unbox_numpy_null(dict(np.load(path, allow_pickle=False)))
    stat.load_state_dict(data)
    return np.asarray(stat.mean.mean())
