"""Training-image acquisition for Stage-1.

The reference either generates training images with the frozen pipeline
(seeded, guidance 7.5 — compute_z.py:384-418) or loads them from
``request["training_img_paths"]`` / ``request["images"]``.  Both paths are
kept; generation is batched across all concepts' prompts through the
mesh-shardable sampler instead of one pipe() call per concept.

Output format: scaled VAE posterior (mean, logvar), shaped
``(C, samples_per_prompt, P, h, w, c)`` — Stage-1 re-samples the posterior
each step, which the reference does implicitly by calling
``vae.encode(...).latent_dist.sample()`` per iteration (compute_z.py:498).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emcid_tpu.models.pipeline import SDComponents, generate


def preprocess_images(images, resolution: int = 512) -> np.ndarray:
    """PIL images / arrays → float32 NHWC in [-1, 1]
    (reference preprocess_img, compute_z.py:34-54)."""
    out = []
    for img in images:
        if hasattr(img, "convert"):  # PIL
            img = img.convert("RGB").resize((resolution, resolution))
            arr = np.asarray(img, dtype=np.float32) / 255.0
        else:
            arr = np.asarray(img, dtype=np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
        out.append(arr * 2.0 - 1.0)
    return np.stack(out)


def encode_posterior(components: SDComponents, images: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Images [-1,1] NHWC → scaled posterior (mean, logvar)."""

    from emcid_tpu.models.pipeline import _cached_jit

    vae, sf = components.vae, components.scaling_factor

    def _build():
        def enc(vae_params, x):
            dist = vae.apply({"params": vae_params}, x, method="encode")
            return (dist.mean * sf, dist.logvar + 2.0 * jnp.log(sf))

        return jax.jit(enc)

    enc = _cached_jit(("encode_posterior", vae.config, str(vae.dtype), sf),
                      _build)
    mean, logvar = enc(components.vae_params, jnp.asarray(images))
    return np.asarray(mean), np.asarray(logvar)


def resolve_cfg_interval(cfg_interval: Optional[float],
                         num_inference_steps: int) -> float:
    """Default CFG interval for TRAINING-IMAGE generation.

    Guidance runs only for the first ``cfg_interval`` fraction of sampler
    steps; the low-noise tail is a conditional-only half-batch forward
    (Kynkäänniemi et al. 2024).  Training images only — eval generation
    always keeps the reference's full-interval CFG (compute_z.py:384-418).

    PRODUCT DEFAULT 0.6, measured on-chip (PERF.md round 4): at SD shapes
    the Stage-1 z trained on cfg-0.6 images agrees with the reference-
    protocol z at cos 1.000 / norm ratio 1.000 (far inside the 0.942 MC
    seed-noise floor) while removing ~20% of the training-image UNet
    forwards.  The default engages only for protocol-sized samplers
    (>= 10 steps) so tiny smoke runs stay reference-exact; explicit
    ``EMCID_TPU_CFG_INTERVAL`` wins verbatim, and 1.0 restores the
    reference protocol exactly (guards tests/test_cfg_interval.py +
    test_deviation_guards.py).
    """
    import os

    if cfg_interval is not None:
        return float(cfg_interval)
    env = os.environ.get("EMCID_TPU_CFG_INTERVAL")
    if env is not None:
        return float(env)
    return 0.6 if num_inference_steps >= 10 else 1.0


def generate_posteriors(
    components: SDComponents,
    prompts,
    seeds,
    batch_size: Optional[int] = None,
    mesh=None,
    **sample_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Text → scaled VAE posterior (mean, logvar) of the generated images,
    entirely on device: the decode → [0,1] clip → re-encode round-trip is
    one fused program, skipping the host uint8 transfer (tens of MB through
    the tunnel) and the quantization the reference's PIL round-trip implies
    — the PNG write/read is an artifact of the reference's process layout,
    not of the algorithm.  uint8 quantization of the intermediate image is
    applied on device for bit-parity with the save-to-disk path."""
    from emcid_tpu.models.pipeline import sample_latents

    prompts, seeds = list(prompts), list(seeds)
    n = len(prompts)
    if batch_size is None:
        # HBM cap on the generation batch: every sample is independently
        # seeded, so chunking only bounds peak memory (equal up to
        # reduction-order float noise — tests/test_pipeline.py chunk
        # parity), enabling C>8 concept blocks whose C*P*CFG latent batch
        # would otherwise exhaust HBM (PERF.md round-3: B=96 gen OOM)
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
    vae = components.vae
    sf = components.scaling_factor

    from emcid_tpu.models.pipeline import _cached_jit

    def _build():
        def fused_fn(vae_params, lat):
            img = vae.apply({"params": vae_params}, lat / sf, method="decode")
            img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
            # quantize like the disk round-trip (uint8) so cached-image and
            # on-device runs are bit-identical
            img = jnp.round(img * 255.0) / 255.0 * 2.0 - 1.0
            dist = vae.apply({"params": vae_params}, img, method="encode")
            return (dist.mean * sf, dist.logvar + 2.0 * jnp.log(sf))

        return jax.jit(fused_fn)

    fused = _cached_jit(("fused_posterior", vae.config, str(vae.dtype), sf),
                        _build)

    vae_params = components.vae_params
    if mesh is not None:
        from emcid_tpu.parallel import replicate

        vae_params = replicate(vae_params, mesh)
    means, logvars = [], []
    for i in range(0, n, bs):
        chunk_p = prompts[i:i + bs]
        chunk_s = seeds[i:i + bs]
        keep = len(chunk_p)
        if bs - keep:
            chunk_p = chunk_p + [chunk_p[-1]] * (bs - keep)
            chunk_s = chunk_s + [0] * (bs - keep)
        lat = sample_latents(components, chunk_p, chunk_s, mesh=mesh,
                             **sample_kwargs)
        m, lv = fused(vae_params, lat)
        means.append(np.asarray(m)[:keep])
        logvars.append(np.asarray(lv)[:keep])
    return np.concatenate(means), np.concatenate(logvars)


def training_latents_for_requests(
    components: SDComponents,
    requests: Sequence[Dict],
    hparams,
    height: int = 512,
    width: int = 512,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    batch_size: Optional[int] = None,
    mesh=None,
    use_dest_prompts=False,  # bool or per-request sequence of bools
    return_images: bool = False,
    sampler: str = "pndm",
    cfg_interval: Optional[float] = None,
    verbose: bool = False,
):
    """(C, Simg, P, h, w, c) scaled posterior mean/logvar for all requests.

    Per request: use ``images`` / ``training_img_paths`` when provided (the
    torch-free real-image mode), else generate ``samples_per_prompt`` images
    per source prompt with the frozen pipeline, seeded by ``seed_train``.

    ``use_dest_prompts`` generates from the dest-formatted prompts instead —
    the reference's v1/txt_img_align path trains ablate-dest on DEST images
    (compute_z.py:1440-1446) while the main path uses source images (:397-409).
    A sequence of bools selects per request (mixed blocks where only some
    requests carry the txt_img_align flag).
    ``return_images`` additionally returns the [-1, 1] images
    (C*Simg*P, H, W, 3) for CLIP scoring.
    """
    cfg_interval = resolve_cfg_interval(cfg_interval, num_inference_steps)
    Simg = getattr(hparams, "samples_per_prompt", 1)
    P = len(requests[0]["prompts"])
    if isinstance(use_dest_prompts, bool):
        use_dest = [use_dest_prompts] * len(requests)
    else:
        use_dest = list(use_dest_prompts)
        assert len(use_dest) == len(requests)

    gen_prompts: List[str] = []
    gen_seeds: List[int] = []
    gen_slots: List[Tuple[int, int, int]] = []
    loaded: Dict[Tuple[int, int, int], np.ndarray] = {}

    for c, request in enumerate(requests):
        word = request["dest"] if use_dest[c] else request["source"]
        src_prompts = [p.format(word) for p in request["prompts"]]
        imgs = None
        if "training_img_paths" in request:
            import os

            from PIL import Image

            paths = request["training_img_paths"]
            if all(os.path.exists(pp) for pp in paths):
                imgs = [Image.open(pp) for pp in paths]
            else:
                print(f"[emcid_tpu] training_img_paths missing on disk "
                      f"({paths[0]}...) — falling back to generation")
        elif "images" in request:
            imgs = request["images"]
        if imgs is not None:
            arr = preprocess_images(imgs, resolution=height)
            # tile/truncate to (Simg, P)
            need = Simg * P
            reps = int(np.ceil(need / len(arr)))
            arr = np.tile(arr, (reps, 1, 1, 1))[:need]
            for s in range(Simg):
                for p in range(P):
                    loaded[(c, s, p)] = arr[s * P + p]
        else:
            seed0 = int(request.get("seed_train") or 0)
            for s in range(Simg):
                for p, prompt in enumerate(src_prompts):
                    gen_prompts.append(prompt)
                    # distinct, reproducible seed per (concept, sample, prompt)
                    gen_seeds.append(seed0 * 10007 + s * 101 + p)
                    gen_slots.append((c, s, p))

    C = len(requests)
    if gen_prompts and not loaded and not return_images:
        # pure-generation block: fused on-device path — latents never leave
        # the chip as uint8 images (saves the decode→host→encode round-trip)
        if verbose:
            print(f"generating {len(gen_prompts)} training images (fused)")
        mean, logvar = generate_posteriors(
            components, gen_prompts, gen_seeds, batch_size=batch_size,
            mesh=mesh, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, height=height, width=width,
            sampler=sampler, cfg_interval=cfg_interval,
        )
        h, w, ch = mean.shape[1:]
        m = np.empty((C, Simg, P, h, w, ch), np.float32)
        lv = np.empty_like(m)
        for (c, s, p), mm, ll in zip(gen_slots, mean, logvar):
            m[c, s, p] = mm
            lv[c, s, p] = ll
        return m, lv

    if gen_prompts:
        if verbose:
            print(f"generating {len(gen_prompts)} training images")
        imgs = generate(
            components, gen_prompts, gen_seeds,
            batch_size=batch_size, mesh=mesh,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            height=height, width=width, sampler=sampler,
            cfg_interval=cfg_interval,
        )
        arr = imgs.astype(np.float32) / 255.0 * 2.0 - 1.0
        for slot, im in zip(gen_slots, arr):
            loaded[slot] = im

    all_imgs = np.stack(
        [loaded[(c, s, p)] for c in range(C) for s in range(Simg)
         for p in range(P)]
    )
    mean, logvar = encode_posterior(components, all_imgs)
    h, w, ch = mean.shape[1:]
    out = (
        mean.reshape(C, Simg, P, h, w, ch),
        logvar.reshape(C, Simg, P, h, w, ch),
    )
    if return_images:
        return out + (all_imgs,)
    return out
