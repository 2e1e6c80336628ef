"""UNet-layer covariance pre-cache (reference layer_stats_unet,
layer_stats.py:223-330, and compute_all_unet_stats :499-575): for an
editable UNet module, accumulate the second moment of its inputs over
(image, caption) pairs, sampling ``t_steps_per_pair`` noised forwards per
pair.  Cache codec: ``{stats_dir}/unet/{ds}_stats/{layer}_{prec}_mom2_
t{steps}_{pairs}.npz`` (same family as the reference's)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.engine.training_images import encode_posterior
from emcid_tpu.models.pipeline import SDComponents, encode_prompts
from emcid_tpu.models.scheduler import add_noise
from emcid_tpu.stats import CombinedStat, SecondMoment, tally


def unet_stats_filename(stats_dir, ds_name, layer_name, precision,
                        t_steps, n_pairs) -> Path:
    return Path(stats_dir) / (
        f"unet/{ds_name}_stats/"
        f"{layer_name}_{precision}_mom2_t{t_steps}_{n_pairs}.npz"
    )


def layer_stats_unet(
    components: SDComponents,
    layer_name: str,
    kind: str,
    pairs: Sequence[Tuple[np.ndarray, str]],
    stats_dir="data/stats",
    ds_name: str = "ccs_filtered",
    t_steps_per_pair: int = 10,
    precision: str = "float32",
    sample_pair_size: Optional[int] = None,
    force_recompute: bool = False,
    rng_seed: int = 0,
) -> CombinedStat:
    """Second moment of ``layer_name``'s inputs over caption/image pairs.

    kind ∈ {"attn-out", "mlp", "res-last-conv"} selects the sow'd input tap
    (engine.unet_edit._SOW_LEAF).  pairs: (image [-1,1] NHWC, caption).
    """
    from emcid_tpu.engine.unet_edit import _SOW_LEAF, _intermediate_path

    filename = unet_stats_filename(
        stats_dir, ds_name, layer_name, precision, t_steps_per_pair,
        sample_pair_size or len(pairs),
    )
    stat = CombinedStat(mom2=SecondMoment())
    loader = tally(
        stat, list(pairs),
        cache=(str(filename) if not force_recompute else None),
        sample_size=sample_pair_size, batch_size=1, random_sample=1,
        quiet=True, collate_fn=lambda items: items[0],
    )
    ipath = _intermediate_path(layer_name, kind)
    leaf = _SOW_LEAF[kind]
    tok = components.tokenizer
    key = jax.random.PRNGKey(rng_seed)
    n_ts = components.schedule.num_train_timesteps

    @jax.jit
    def extract(unet_params, vae_params, ids, image, key):
        dist = components.vae.apply({"params": vae_params}, image[None],
                                    method="encode")
        k0, key = jax.random.split(key)
        latents = dist.sample(k0) * components.scaling_factor
        ctx = components.text_encoder.apply(
            {"params": components.text_params}, ids).last_hidden_state

        def step(carry, k):
            k1, k2 = jax.random.split(k)
            noise = jax.random.normal(k1, latents.shape, latents.dtype)
            ts = jax.random.randint(k2, (1,), 0, n_ts)
            noisy = add_noise(components.schedule, latents, noise, ts)
            _, state = components.unet.apply(
                {"params": unet_params}, noisy, ts, ctx,
                mutable=["intermediates"],
            )
            node = state["intermediates"]
            for p in ipath:
                node = node[p]
            feats = node[leaf][0]
            if feats.ndim == 4:
                feats = feats.reshape(-1, feats.shape[-1])
            else:
                feats = feats.reshape(-1, feats.shape[-1])
            # precision pinned at the dot (not a context decorator around
            # this whole function: the UNet forward above must keep its
            # default trace context — runtime.pdot scope rule, ADVICE r4)
            return carry + jnp.dot(
                feats.T.astype(jnp.float32), feats.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), feats.shape[0]

        total = None
        count = 0
        for i in range(t_steps_per_pair):
            k_i = jax.random.fold_in(key, i)
            if total is None:
                # shape probe on first step
                pass
            total, n = step(total if total is not None else 0.0, k_i)
            count += n
        return total, count

    for img, caption in loader:
        enc = tok([caption], padding="max_length", truncation=True,
                  max_length=tok.model_max_length)
        key, sub = jax.random.split(key)
        total, count = extract(
            components.unet_params, components.vae_params,
            jnp.asarray(enc["input_ids"]),
            jnp.asarray(np.asarray(img, np.float32)), sub,
        )
        # inject the pair's accumulated moment into the running stat
        total = np.asarray(total)
        if stat.mom2.mom2 is None:
            stat.mom2.mom2 = np.zeros_like(total)
        stat.mom2.mom2 = np.asarray(stat.mom2.mom2) + total
        stat.mom2.count += int(count)
    return stat
