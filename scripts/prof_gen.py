"""TPU breakdown of the training-image generation phase.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_gen.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet, sd_vae
    from emcid_tpu.models.pipeline import (
        SDComponents, decode_latents, encode_prompts, sample_latents,
    )
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.models.vae import AutoencoderKL
    from emcid_tpu.engine.training_images import encode_posterior
    from emcid_tpu.text import make_tiny_tokenizer

    tok = make_tiny_tokenizer([f"w{i}" for i in range(9)] +
                              ["photo", "of", "a", "an", "image"],
                              model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    tp = text.init_params(jax.random.PRNGKey(0))
    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(1))
    vae = AutoencoderKL(sd_vae(), dtype=jnp.bfloat16)
    vp = vae.init_params(jax.random.PRNGKey(2), image_size=512)
    comps = SDComponents(tokenizer=tok, text_encoder=text, text_params=tp,
                         unet=unet, unet_params=up, vae=vae, vae_params=vp,
                         schedule=sd_schedule())
    prompts = [f"a photo of a w{i % 8}" for i in range(24)]
    seeds = list(range(24))

    # warm
    t0 = time.time()
    lat = sample_latents(comps, prompts, seeds, num_inference_steps=50,
                         guidance_scale=7.5, height=512, width=512,
                         sampler="pndm")
    _ = np.asarray(lat[0, 0, 0, 0])
    print(f"sample warm(compile) {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    lat = sample_latents(comps, prompts, seeds, num_inference_steps=50,
                         guidance_scale=7.5, height=512, width=512,
                         sampler="pndm")
    _ = np.asarray(lat[0, 0, 0, 0])
    print(f"sample 50 steps B=24(CFG48): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    imgs = decode_latents(comps, lat)
    print(f"decode warm(compile+transfer) {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    imgs = decode_latents(comps, lat)
    print(f"decode 24x512x512 + uint8 transfer: {time.time() - t0:.1f}s",
          flush=True)

    x = imgs.astype(np.float32) / 255.0 * 2.0 - 1.0
    t0 = time.time()
    mean, logvar = encode_posterior(comps, x)
    print(f"encode warm(compile+up-transfer) {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.time()
    mean, logvar = encode_posterior(comps, x)
    print(f"encode 24 imgs (75MB up + run): {time.time() - t0:.1f}s",
          flush=True)

    # fused on-device posterior (no host round-trip)
    @jax.jit
    def fused_post(vp, lat):
        img = vae.apply({"params": vp}, lat / comps.scaling_factor,
                        method="decode")
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0) * 2.0 - 1.0
        dist = vae.apply({"params": vp}, img, method="encode")
        return (dist.mean * comps.scaling_factor,
                dist.logvar + 2.0 * jnp.log(comps.scaling_factor))

    t0 = time.time()
    m2, lv2 = fused_post(vp, lat)
    _ = np.asarray(m2[0, 0, 0, 0])
    print(f"fused posterior warm {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    m2, lv2 = fused_post(vp, lat)
    _ = np.asarray(m2[0, 0, 0, 0])
    print(f"fused posterior: {time.time() - t0:.1f}s", flush=True)
    print("fused vs host-roundtrip mean err:",
          float(np.abs(np.asarray(m2) - mean).max()), flush=True)


if __name__ == "__main__":
    main()
