"""Stable-Diffusion text→image pipeline: seeded, batched, mesh-shardable.

Replaces the reference's per-image ``pipe([prompt], generator=manual_seed(s))``
loops (run_emcid.py:84-95, emcid_test.py:1399-1411, eval_coco.py:40-70) with
a single jit-compiled sampling program:

* prompt encoding, CFG-paired UNet denoising (cond/uncond in one batched
  forward), the full ``lax.scan`` over inference steps, and VAE decode are
  one XLA program — no per-step python, no host sync until the final image;
* seeding is per-image: latents are drawn from ``jax.random.PRNGKey(seed)``
  per image, so any (prompt, seed) pair is reproducible regardless of batch
  composition or device count (the reference's determinism contract,
  SURVEY.md §4.3 — RNG streams differ from torch by construction);
* the image batch axis shards over the device mesh (parallel/mesh.py): eval
  generation — the #1 hot loop (SURVEY.md §3, "hot loops ranked") — scales
  linearly over chips with zero communication inside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.scheduler import (
    Schedule,
    ddim_step,
    ddim_timesteps,
    scan_sampler,
    sd_schedule,
)


@dataclass
class SDComponents:
    """Bundle of the models forming one Stable Diffusion pipeline."""

    tokenizer: Any
    text_encoder: Any  # CLIPTextEncoder module
    text_params: Any
    unet: Any  # UNet2DCondition module
    unet_params: Any
    vae: Any  # AutoencoderKL module
    vae_params: Any
    schedule: Schedule = field(default_factory=sd_schedule)
    scaling_factor: float = 0.18215
    latent_channels: int = 4
    vae_scale: int = 8

    def replace_text_params(self, new_params) -> "SDComponents":
        """Functional text-encoder swap — the reference's edit/restore cycle
        (refact_benchmark_eval.py:163-168) is just two of these."""
        import dataclasses

        return dataclasses.replace(self, text_params=new_params)

    def replace_unet_params(self, new_params) -> "SDComponents":
        import dataclasses

        return dataclasses.replace(self, unet_params=new_params)


# jitted per-module helper programs, cached so repeat calls neither retrace
# nor (on the tunneled TPU) dispatch eagerly primitive-by-primitive
_JIT_CACHE: Dict[Any, Any] = {}


def _cached_jit(key, build):
    from emcid_tpu.runtime import trace_env_knobs

    key = (key, trace_env_knobs())
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = build()
    return fn


def encode_prompts(components: SDComponents, prompts: Sequence[str],
                   max_length: Optional[int] = None) -> jnp.ndarray:
    """Prompts → (B, S, H) text-encoder hidden states (SD conditioning)."""
    tok = components.tokenizer
    enc = tok(list(prompts), padding="max_length", truncation=True,
              max_length=max_length or tok.model_max_length)
    text = components.text_encoder
    run = _cached_jit(
        ("encode_prompts", text.config, str(text.dtype)),
        lambda: jax.jit(
            lambda p, ids: text.apply({"params": p}, ids).last_hidden_state
        ),
    )
    return run(components.text_params, jnp.asarray(enc["input_ids"]))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _seeded_normal(keys: jnp.ndarray, h: int, w: int, c: int,
                   dtype) -> jnp.ndarray:
    return jax.vmap(
        lambda k: jax.random.normal(k, (h, w, c), dtype)
    )(keys)


def seeds_to_keys(seeds: Sequence[int]) -> np.ndarray:
    """(B, 2) uint32 raw PRNG keys, bit-identical to
    ``jax.random.PRNGKey(int(s))`` under the ambient config — including
    for negative and ≥2**32 seeds (tests/test_pipeline.py).  PRNGKey
    truncates the seed to its low 32 bits when jax x64 is disabled (the
    default; hi word = 0) and does the full 64-bit hi/lo split when
    enabled; doing the same split on the host preserves the determinism
    of the old per-seed PRNGKey path for every seed value."""
    import jax

    x64 = bool(jax.config.jax_enable_x64)
    return np.asarray(
        [(((int(s) >> 32) & 0xFFFFFFFF) if x64 else 0, int(s) & 0xFFFFFFFF)
         for s in seeds], np.uint32)


def initial_latents(seeds: Sequence[int], height: int, width: int,
                    channels: int = 4, vae_scale: int = 8,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Per-image seeded latents (B, h/8, w/8, C) — one program, not one
    PRNG dispatch per seed (each eager op is a round-trip on the tunneled
    backend)."""
    return _seeded_normal(
        jnp.asarray(seeds_to_keys(seeds)),
        height // vae_scale, width // vae_scale, channels, dtype,
    )


# Compiled samplers keyed by (unet config id, steps, sampler, guidance on/off)
_SAMPLER_CACHE: Dict[Any, Any] = {}


def _get_sampler(unet, schedule: Schedule, num_steps: int, sampler: str,
                 do_cfg: bool, cfg_frac: float = 1.0):
    from emcid_tpu.runtime import trace_env_knobs

    key = (unet.config, str(unet.dtype), schedule.num_train_timesteps,
           num_steps, sampler, do_cfg, cfg_frac, trace_env_knobs())
    if key in _SAMPLER_CACHE:
        return _SAMPLER_CACHE[key]

    ts = ddim_timesteps(schedule, num_steps)
    ts_prev = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    # CFG interval: guidance runs only for the first cfg_frac of the steps
    # (high/mid noise); the tail is a half-batch conditional-only forward
    n_head = (max(1, int(round(cfg_frac * num_steps)))
              if do_cfg and cfg_frac < 1.0 else None)

    @jax.jit
    def run(unet_params, latents, ctx_cond, ctx_uncond, guidance_scale):
        B = latents.shape[0]

        def eps_plain(lat, t):
            return unet.apply(
                {"params": unet_params}, lat, jnp.broadcast_to(t, (B,)),
                ctx_cond,
            ).sample

        def unet_eps(lat, t):
            if do_cfg:
                lat2 = jnp.concatenate([lat, lat], axis=0)
                ctx2 = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
                eps2 = unet.apply(
                    {"params": unet_params}, lat2,
                    jnp.broadcast_to(t, (2 * B,)), ctx2,
                ).sample
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                return eps_u + guidance_scale * (eps_c - eps_u)
            return eps_plain(lat, t)

        return scan_sampler(sampler, schedule, unet_eps, latents, ts,
                            ts_prev, unet_eps_tail=eps_plain, n_head=n_head)

    _SAMPLER_CACHE[key] = run
    return run


def sample_latents(
    components: SDComponents,
    prompts: Sequence[str],
    seeds: Sequence[int],
    *,
    negative_prompts: Optional[Sequence[str]] = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    height: int = 512,
    width: int = 512,
    sampler: str = "pndm",
    cfg_interval: float = 1.0,
    mesh=None,
) -> jnp.ndarray:
    """Denoise to final latents (pre-VAE).

    With ``mesh``, the image batch shards over the device mesh (params
    replicated, batch axis split) — per-image seeding makes results
    identical to the single-device run regardless of device count.

    ``cfg_interval < 1`` applies classifier-free guidance only for the
    first ``cfg_interval`` fraction of steps; the low-noise tail runs the
    conditional half-batch only (guidance contributes little there —
    Kynkäänniemi et al. 2024).  1.0 (default) is the reference protocol."""
    assert len(prompts) == len(seeds), "one seed per prompt"
    if not 0.0 < cfg_interval <= 1.0:
        # catch typos like EMCID_TPU_CFG_INTERVAL=6 (meaning 0.6): >1 would
        # silently disable the lever, <=0 would silently run 1 guided step
        raise ValueError(f"cfg_interval={cfg_interval} must be in (0, 1]")
    ctx_cond = encode_prompts(components, prompts)
    do_cfg = guidance_scale > 1.0
    if do_cfg:
        neg = negative_prompts if negative_prompts is not None else [""] * len(prompts)
        ctx_uncond = encode_prompts(components, neg)
    else:
        ctx_uncond = ctx_cond
    latents = initial_latents(seeds, height, width,
                              components.latent_channels, components.vae_scale)
    unet_params = components.unet_params
    if mesh is not None:
        from emcid_tpu.parallel import replicate, shard_batch

        if len(prompts) % mesh.devices.size:
            raise ValueError(
                f"batch {len(prompts)} must divide the mesh "
                f"({mesh.devices.size} devices); pad the chunk (generate() "
                "does this automatically)"
            )
        latents = shard_batch(latents, mesh)
        ctx_cond = shard_batch(ctx_cond, mesh)
        ctx_uncond = shard_batch(ctx_uncond, mesh)
        unet_params = replicate(unet_params, mesh)
    run = _get_sampler(components.unet, components.schedule,
                       num_inference_steps, sampler, do_cfg,
                       cfg_frac=cfg_interval)
    return run(unet_params, latents, ctx_cond, ctx_uncond,
               jnp.float32(guidance_scale))


def decode_latents(components: SDComponents, latents: jnp.ndarray,
                   mesh=None) -> np.ndarray:
    """Latents → uint8 RGB images (B, H, W, 3).  A sharded latent batch
    decodes sharded (params replicated); the host transfer gathers."""

    vae, sf = components.vae, components.scaling_factor
    dec = _cached_jit(
        ("decode", vae.config, str(vae.dtype), sf),
        lambda: jax.jit(lambda p, lat: jnp.clip(
            vae.apply({"params": p}, lat / sf, method="decode") / 2 + 0.5,
            0.0, 1.0,
        )),
    )
    vae_params = components.vae_params
    if mesh is not None:
        from emcid_tpu.parallel import replicate, shard_batch

        latents = shard_batch(latents, mesh)
        vae_params = replicate(vae_params, mesh)
    img = dec(vae_params, latents)
    return np.asarray(jnp.round(img * 255).astype(jnp.uint8))


def encode_images(components: SDComponents, images: np.ndarray,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """uint8/float RGB (B, H, W, 3) → scaled latents (Stage-1 training-image
    encoding, reference compute_z.py:498)."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x * 2.0 - 1.0

    vae, sf = components.vae, components.scaling_factor
    enc = _cached_jit(
        ("encode_images", vae.config, str(vae.dtype), sf, rng is None),
        lambda: jax.jit(lambda p, x, key: (
            vae.apply({"params": p}, x, method="encode").mode() if key is None
            else vae.apply({"params": p}, x, method="encode").sample(key)
        ) * sf),
    )
    return enc(components.vae_params, x, rng)


def generate(
    components: SDComponents,
    prompts: Sequence[str],
    seeds: Sequence[int],
    batch_size: Optional[int] = None,
    mesh=None,
    **kwargs,
) -> np.ndarray:
    """End-to-end text→image.  Chunks the prompt list into fixed-size batches
    — EVERY chunk (including a short first one) is padded to ``batch_size``
    so exactly one program shape compiles — and shards the image batch over
    ``mesh`` when given (eval generation is hot loop #1, SURVEY.md §3)."""
    prompts, seeds = list(prompts), list(seeds)
    n = len(prompts)
    if batch_size is None:
        # same HBM cap as engine.training_images.generate_posteriors:
        # per-sample seeding makes chunking result-preserving (uint8 output
        # is exactly equal), env-gated so C>8 concept blocks can bound
        # their generation batch
        import os

        env_bs = int(os.environ.get("EMCID_TPU_GEN_BATCH", "0") or 0)
        # the env value is a CAP, not a target: never pad a small prompt
        # list UP to it (an explicit batch_size argument MAY exceed n —
        # callers use that to keep one compiled shape across calls)
        batch_size = min(env_bs, n) if env_bs else None
    bs = batch_size or n
    if mesh is not None:
        from emcid_tpu.parallel import pad_to_multiple

        bs = pad_to_multiple(bs, mesh.devices.size)
    images = []
    for i in range(0, n, bs):
        chunk_p = prompts[i:i + bs]
        chunk_s = seeds[i:i + bs]
        keep = len(chunk_p)
        pad = bs - keep
        if pad:  # keep shapes static across chunks (incl. the first: a fresh
            # shape costs a full XLA compile — minutes on a remote TPU)
            chunk_p = chunk_p + [chunk_p[-1]] * pad
            chunk_s = chunk_s + [0] * pad
        lat = sample_latents(components, chunk_p, chunk_s, mesh=mesh, **kwargs)
        imgs = decode_latents(components, lat, mesh=mesh)
        images.append(imgs[:keep])
    return np.concatenate(images, axis=0)
