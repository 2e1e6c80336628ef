"""Stage-1 variants beyond the standard noise-loss objective.

* ``sld_sample_latents`` + ``compute_z_text_encoder_global`` — the
  SLD-supervised NSFW path (reference compute_z_text_encoder_global,
  compute_z.py:77-312, and sld_generate :2178-2249): training images are
  generated under Safe Latent Diffusion guidance (the model steered AWAY
  from the unsafe concept), then the standard ablate-style optimization
  pulls the source representation toward reproducing those safe images.
* ``compute_z_refact`` — the ReFACT/contrastive variant
  (reference compute_z.py:1991-2175, ContrastEMCIDHyperParams): optimize the
  delta so the edited prompt's pooled CLIP embedding moves to the dest text
  embedding under a distance-softmax contrastive loss over
  [dest] + negatives, with an L2 regularizer toward the original
  representation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emcid_tpu.engine.compute_z import prepare_concept_batch
from emcid_tpu.models.pipeline import (
    SDComponents,
    decode_latents,
    encode_prompts,
    initial_latents,
)
from emcid_tpu.models.scheduler import ddim_step, ddim_timesteps
from emcid_tpu.text.token_range import find_token_range

# SLD hyperparameter presets (Schramowski et al.; the reference's max/strong
# dicts, compute_z.py:190-207)
SLD_CONFIGS = {
    "max": dict(guidance_scale=7.5, sld_guidance_scale=5000,
                sld_warmup_steps=0, sld_threshold=1.0, sld_momentum=0.5),
    "strong": dict(guidance_scale=7.5, sld_guidance_scale=2000,
                   sld_warmup_steps=7, sld_threshold=0.025, sld_momentum=0.5),
}


def sld_sample_latents(
    components: SDComponents,
    prompts: Sequence[str],
    seeds: Sequence[int],
    safety_concepts: str,
    sld_type: str = "max",
    num_inference_steps: int = 50,
    height: int = 512,
    width: int = 512,
) -> jnp.ndarray:
    """Safe Latent Diffusion sampling: CFG plus a safety-guidance term that
    pushes the trajectory away from the safety-concept direction."""
    cfg = SLD_CONFIGS[sld_type]
    ctx_c = encode_prompts(components, list(prompts))
    ctx_u = encode_prompts(components, [""] * len(prompts))
    ctx_s = encode_prompts(components, [safety_concepts] * len(prompts))
    latents = initial_latents(seeds, height, width,
                              components.latent_channels,
                              components.vae_scale)
    ts = ddim_timesteps(components.schedule, num_inference_steps)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    unet, pu = components.unet, components.unet_params
    schedule = components.schedule
    g = cfg["guidance_scale"]
    s_g = cfg["sld_guidance_scale"]
    warmup = cfg["sld_warmup_steps"]
    thresh = cfg["sld_threshold"]
    mom = cfg["sld_momentum"]

    @jax.jit
    def run(pu, latents):
        B = latents.shape[0]

        def body(carry, x):
            lat, momentum = carry
            t, t_prev, step_i = x
            lat3 = jnp.concatenate([lat, lat, lat], axis=0)
            ctx3 = jnp.concatenate([ctx_u, ctx_c, ctx_s], axis=0)
            eps3 = unet.apply({"params": pu}, lat3,
                              jnp.broadcast_to(t, (3 * B,)), ctx3).sample
            eps_u, eps_c, eps_s = jnp.split(eps3, 3, axis=0)
            guidance = eps_c - eps_u
            # SLD safety term (Schramowski et al., eq. 6-10)
            scale = jnp.clip(jnp.abs(guidance) * s_g, 0.0, 1.0)
            safety = jnp.where(
                (eps_c - eps_s) >= thresh, jnp.zeros_like(scale), scale
            ) * (eps_s - eps_u)
            safety = safety + mom * momentum
            momentum = safety
            safety = jnp.where(step_i >= warmup, safety, jnp.zeros_like(safety))
            eps = eps_u + g * (guidance - safety)
            return (ddim_step(schedule, lat, eps, t, t_prev), momentum), None

        (lat, _), _ = jax.lax.scan(
            body, (latents, jnp.zeros_like(latents)),
            (jnp.asarray(ts), jnp.asarray(ts_prev),
             jnp.arange(len(ts))),
        )
        return lat

    return run(pu, latents)


def compute_z_text_encoder_global(
    components: SDComponents,
    request: Dict,
    hparams,
    layer: int,
    num_inference_steps: int = 20,
    height: int = 512,
    width: int = 512,
    rng: Optional[jax.Array] = None,
    verbose: bool = True,
) -> np.ndarray:
    """SLD-supervised z for a global concept (NSFW) request
    ``{source_prompts, seeds, safe_words, source, dest}``:
    generate SLD-safe latents for the unsafe prompts, then run the standard
    ablate-style optimization with those latents as the targets."""
    from emcid_tpu.engine.compute_z import ConceptBatch, ZOptimizer
    from emcid_tpu.engine.training_images import encode_posterior

    prompts = request["source_prompts"]
    seeds = request.get("seeds") or list(range(len(prompts)))
    safe_words = (request.get("safe_words") or [""])[0]
    latents = sld_sample_latents(
        components, prompts, seeds, safe_words,
        sld_type=getattr(hparams, "sld_type", "max"),
        num_inference_steps=num_inference_steps, height=height, width=width,
    )
    imgs = decode_latents(components, latents)
    mean, logvar = encode_posterior(
        components, imgs.astype(np.float32) / 255.0 * 2.0 - 1.0)

    # treat the unsafe prompts verbatim with dest = the safe words / " "
    req = {
        "prompts": ["{}"] * len(prompts),
        "source": request["source"],
        "dest": request.get("dest") or " ",
        "source_prompts": prompts,
    }
    # prepare_concept_batch formats templates with source; for verbatim
    # prompts we inject them via per-prompt templates
    req["prompts"] = [p.replace("{", "{{").replace("}", "}}") for p in prompts]
    # the subject token is the *source keyword* if present, else last token
    sub_requests = [dict(req, source=request["source"])]

    # locate the keyword in each prompt; fall back to the final token
    tok = components.tokenizer
    arrays, _, _ = prepare_concept_batch(tok, [{
        "prompts": req["prompts"], "source": request["source"],
        "dest": req["dest"],
    }], hparams)
    for p_i, prompt in enumerate(prompts):
        enc = tok([prompt], padding="max_length", truncation=True,
                  max_length=tok.model_max_length)
        n_real = int(np.asarray(enc["attention_mask"][0]).sum())
        try:
            _, end = find_token_range(
                tok, np.asarray(enc["input_ids"][0][:n_real]),
                request["source"])
            idx = end - 1
        except ValueError:
            idx = n_real - 1
        arrays["source_ids"][0, p_i] = enc["input_ids"][0]
        arrays["inject_mask"][0, :, p_i, :] = 0.0
        arrays["inject_mask"][0, 0, p_i, idx] = 1.0
        arrays["source_lookup"][0, p_i] = idx

    batch = ConceptBatch(
        source_ids=jnp.asarray(arrays["source_ids"]),
        dest_ids=jnp.asarray(arrays["dest_ids"]),
        inject_mask=jnp.asarray(arrays["inject_mask"]),
        source_lookup=jnp.asarray(arrays["source_lookup"]),
        dest_lookup=jnp.asarray(arrays["dest_lookup"]),
        latents_mean=jnp.asarray(mean[None, None]),
        latents_logvar=jnp.asarray(logvar[None, None]),
    )
    optz = ZOptimizer(components.text_encoder, components.unet,
                      components.schedule, hparams, layer)
    zs, delta, z0, losses = optz.run(
        components.text_params, components.unet_params, batch,
        rng if rng is not None else jax.random.PRNGKey(0))
    if verbose:
        print(f"global z opt final loss {float(losses[-1]):.5f}")
    return np.asarray(zs)[0]


def compute_z_refact(
    components: SDComponents,
    request: Dict,
    hparams,
    layer: int,
    clip_text_model=None,
    clip_text_params=None,
    rng: Optional[jax.Array] = None,
    verbose: bool = True,
) -> np.ndarray:
    """ReFACT-style contrastive z (reference compute_z_refact,
    compute_z.py:1991-2175): delta at the edit token so the edited prompt's
    pooled embedding wins a distance-softmax over [dest] + negatives.

    Uses the pipeline's own text tower (plus projection when available) as
    the embedding space; a separate CLIP tower can be supplied.
    """
    hp = hparams
    tok = components.tokenizer
    text = clip_text_model or components.text_encoder
    tparams = clip_text_params if clip_text_params is not None \
        else components.text_params

    src_prompts = [p.format(request["source"]) for p in request["prompts"]]
    enc = tok(src_prompts, padding="max_length", truncation=True,
              max_length=tok.model_max_length)
    ids = jnp.asarray(enc["input_ids"])
    P, S = ids.shape
    mask = np.zeros((P, S), np.float32)
    for p in range(P):
        n_real = int(np.asarray(enc["attention_mask"][p]).sum())
        _, end = find_token_range(tok, np.asarray(enc["input_ids"][p][:n_real]),
                                  request["source"])
        mask[p, end - 1] = 1.0
    mask = jnp.asarray(mask)

    dest_texts = [request["dest"]] + list(request.get("negative_prompts") or [])
    d_enc = tok(dest_texts, padding="max_length", truncation=True,
                max_length=tok.model_max_length)
    dest_pooled = text.apply({"params": tparams},
                             jnp.asarray(d_enc["input_ids"])).pooled_output

    out0 = text.apply({"params": tparams}, ids[:1],
                      capture=("layer_out",), stop_at_layer=layer)
    z0 = (out0.taps["layer_out"][layer][0] * mask[0][:, None]).sum(0)
    z0n = jnp.linalg.norm(z0)

    opt = optax.adam(hp.v_lr)
    H = z0.shape[-1]

    # params/activations as jit ARGUMENTS (a closure-captured encoder is
    # baked into the program as constants) and ONE scanned program for the
    # whole optimization (the old per-step loop paid a ~0.5 s host
    # round-trip per step on the tunneled backend)
    @jax.jit
    def run(tparams, ids, mask, dest_pooled, z0n, steps_arr):
        def loss_fn(delta):
            inj = mask[..., None] * delta[None, None, :]
            out = text.apply({"params": tparams}, ids,
                             inject_layer=layer, inject_delta=inj)
            pooled = out.pooled_output  # (P, H)
            # negative-distance logits (reference uses -cdist, :2100-2110)
            d = jnp.linalg.norm(
                pooled[:, None, :] - dest_pooled[None, :, :], axis=-1)
            logp = jax.nn.log_softmax(-d, axis=-1)
            nll = -logp[:, 0].mean()
            reg = (hp.v_weight_decay
                   * jnp.sqrt(jnp.sum(delta**2) + 1e-12) / z0n**2)
            return nll + reg

        def step(carry, _):
            delta, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(delta)
            updates, opt_state = opt.update(g, opt_state, delta)
            delta = optax.apply_updates(delta, updates)
            n = jnp.linalg.norm(delta)
            mx = hp.clamp_norm_factor * z0n
            delta = delta * jnp.minimum(1.0, mx / jnp.maximum(n, 1e-12))
            return (delta, opt_state), loss

        delta0 = jnp.zeros((H,), jnp.float32)
        (delta, _), losses = jax.lax.scan(
            step, (delta0, opt.init(delta0)), steps_arr)
        return delta, losses

    delta, losses = run(tparams, ids, mask, dest_pooled, z0n,
                        jnp.arange(hp.v_num_grad_steps))
    losses = np.asarray(losses)
    if verbose and losses.size:
        print(f"refact z opt: nll {losses[0]:.4f} -> {losses[-1]:.4f}")
    return np.asarray(z0 + delta)
