"""Finetuning baseline (reference experiments/finetune_text_encoder.py):
instead of a closed-form edit, directly finetune the text encoder's edited
layers with the diffusion noise loss on (source prompt → dest images),
optionally with the simple pooled-alignment loss
(finetune_text_encoder_simple_align, reference :166-213).

TPU-first: one jit'd optax step over the selected fc2 kernels only, with
the same rematerialized UNet forward as Stage-1."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emcid_tpu.models.naming import get_weight, set_weight
from emcid_tpu.models.pipeline import SDComponents, encode_prompts
from emcid_tpu.models.scheduler import add_noise


def finetune_text_encoder(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    latents_mean: np.ndarray,
    latents_logvar: np.ndarray,
    steps: Optional[int] = None,
    lr: Optional[float] = None,
    align_pooler: bool = True,
    rng: Optional[jax.Array] = None,
    verbose: bool = True,
) -> Tuple[SDComponents, list]:
    """Finetune the fc2 weights of ``hparams.layers`` on all requests at
    once.  latents_mean/logvar: (C, Simg, P, h, w, c) as in Stage-1.
    Returns (edited components, loss curve)."""
    steps = steps or hparams.v_num_grad_steps
    lr = lr or hparams.v_lr / 100  # weight-space lr, not delta-space
    tok = components.tokenizer
    text = components.text_encoder

    src_prompts, dst_prompts = [], []
    for r in requests:
        src_prompts += [p.format(r["source"]) for p in r["prompts"]]
        dst_prompts += [p.format(r["dest"]) for p in r["prompts"]]
    enc = tok(src_prompts, padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    src_ids = jnp.asarray(enc["input_ids"])
    dest_hidden = encode_prompts(components, dst_prompts)
    dest_pooled = text.apply({"params": components.text_params},
                             jnp.asarray(tok(dst_prompts)["input_ids"])
                             ).pooled_output

    names = [hparams.rewrite_module_tmp.format(l) for l in hparams.layers]
    trainable = {n: get_weight(components.text_params, n) for n in names}
    lat_mean = jnp.asarray(latents_mean).reshape(
        (-1,) + latents_mean.shape[3:])
    lat_logvar = jnp.asarray(latents_logvar).reshape(
        (-1,) + latents_logvar.shape[3:])
    B = src_ids.shape[0]
    schedule = components.schedule
    unet, pu = components.unet, components.unet_params
    base_params = components.text_params

    def with_weights(ws):
        p = base_params
        for n, w in ws.items():
            p = set_weight(p, n, w)
        return p

    def loss_fn(ws, key):
        k_post, k_noise, k_t = jax.random.split(key, 3)
        latents = lat_mean + jnp.exp(0.5 * lat_logvar) * jax.random.normal(
            k_post, lat_mean.shape, lat_mean.dtype)
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        timesteps = jax.random.randint(k_t, (B,), 0,
                                       schedule.num_train_timesteps)
        noisy = add_noise(schedule, latents, noise, timesteps)
        p = with_weights(ws)
        out = text.apply({"params": p}, src_ids)

        @jax.checkpoint
        def unet_fwd(ctx):
            return unet.apply({"params": pu}, noisy, timesteps, ctx).sample

        eps_edit = unet_fwd(out.last_hidden_state)
        eps_dest = jax.lax.stop_gradient(unet_fwd(dest_hidden))
        loss = jnp.mean((eps_edit - eps_dest) ** 2)
        if align_pooler:
            loss = loss + 0.01 * jnp.mean((out.pooled_output - dest_pooled) ** 2)
        return loss

    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(ws, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(ws, key)
        updates, opt_state = opt.update(grads, opt_state, ws)
        return optax.apply_updates(ws, updates), opt_state, loss

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    losses = []
    for key in jax.random.split(rng, steps):
        trainable, opt_state, loss = step(trainable, opt_state, key)
        losses.append(float(loss))
    if verbose and losses:
        print(f"finetune: loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    return components.replace_text_params(with_weights(trainable)), losses
