"""TPU probe: SDXL component costs (VERDICT r3 ask #3 — PERF.md table).

One process (tunnel discipline), three measurements at REAL shapes with
random-init weights:

  1. SDXL 1024x1024 generation (dual text encoders, 2.6B UNet, CFG,
     DPM++(2M)@25) — wall + TFLOP/s;
  2. SDXL dual-encoder Stage-1 step (joint two-delta optimization,
     engine.sdxl.compute_z_sdxl_text_encoders) — slope-timed ms/step;
  3. SD-v1.4 cross-attn K/V (x-kv) edit: per-layer z targets + closed-form
     insert (engine.cross_attn.apply_emcid_to_cross_attn).

    nohup python -u scripts/prof_sdxl.py > /tmp/sdxl_prof.log 2>&1 &
"""

import dataclasses
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401 (persistent compile cache)
    from emcid_tpu.hparams import load_hparams
    from emcid_tpu.profiling import unet_fwd_flops

    # ---- 1+2: SDXL ----
    from emcid_tpu.engine.sdxl import compute_z_sdxl_text_encoders
    from emcid_tpu.models.sdxl import (
        build_random_sdxl_pipeline, generate_sdxl,
    )

    hp = load_hparams(
        "sdxl-dest_s-100_c-1.2_ly-8-11_ly2-26-31_lr-0.1_wd-8e-03"
        "_txt-align-0.01",
        hparams_dir="/root/reference/hparams")
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    log(f"device {dev.platform}: bytes_in_use="
        f"{stats.get('bytes_in_use', 'n/a')} "
        f"limit={stats.get('bytes_limit', 'n/a')}")

    # init_params keeps f32 master params: 10.4 GB for the 2.6B UNet alone,
    # and an on-device f32->bf16 cast transiently needs 15.6 GB — both
    # starve the 16 GB chip (RESOURCE_EXHAUSTED on the first two attempts
    # of this probe).  Single-v5e SDXL needs bf16-resident params: init on
    # the host CPU backend, cast there, upload leaf-by-leaf.
    log("building random SDXL pipeline on CPU (2.6B UNet)")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        xl = build_random_sdxl_pipeline(dtype=jnp.bfloat16)

    def upload_bf16(tree):
        def one(x):
            a = np.asarray(x)
            if a.dtype == np.float32:
                a = a.astype(jnp.bfloat16)
            return jax.device_put(a, dev)
        return jax.tree.map(one, tree)

    xl = dataclasses.replace(
        xl, unet_params=upload_bf16(xl.unet_params),
        text_params=upload_bf16(xl.text_params),
        text_params_2=upload_bf16(xl.text_params_2),
        vae_params=upload_bf16(xl.vae_params))
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    log(f"params uploaded bf16; bytes_in_use="
        f"{stats.get('bytes_in_use', 'n/a')}")

    import os

    from emcid_tpu.models.sdxl import sample_latents_sdxl

    prompts = ["a photo of a w1"]
    seeds = [0]
    if os.environ.get("SDXL_PROF_SKIP_GEN"):
        log("skipping gen phases (SDXL_PROF_SKIP_GEN)")
    try:
        if os.environ.get("SDXL_PROF_SKIP_GEN"):
            raise RuntimeError("skipped")
        log("warm-up 1024x1024 latent sampling (compile)")
        lat = sample_latents_sdxl(xl, prompts, seeds, height=1024,
                                  width=1024, num_inference_steps=25,
                                  sampler="dpm++", guidance_scale=7.5)
        _ = np.asarray(lat)
        t0 = time.time()
        lat = sample_latents_sdxl(xl, prompts, seeds, height=1024,
                                  width=1024, num_inference_steps=25,
                                  sampler="dpm++", guidance_scale=7.5)
        _ = np.asarray(lat)
        t_lat = time.time() - t0
        gf = unet_fwd_flops(xl.unet.config, 2 * len(prompts), 128) * 25
        log(f"SDXL 1024^2 latent sampling B={len(prompts)} dpm++-25: "
            f"{t_lat:.1f}s ({gf / t_lat / 1e12:.0f} TFLOP/s)")
    except Exception as e:
        log(f"SDXL latent sampling FAILED: {type(e).__name__}: "
            f"{str(e)[:200]}")
    try:
        if os.environ.get("SDXL_PROF_SKIP_GEN"):
            raise RuntimeError("skipped")
        log("warm-up 1024x1024 full generation incl VAE decode (compile)")
        imgs = generate_sdxl(xl, prompts, seeds, height=1024, width=1024,
                             num_inference_steps=25, sampler="dpm++",
                             guidance_scale=7.5)
        _ = np.asarray(imgs)
        t0 = time.time()
        imgs = generate_sdxl(xl, prompts, seeds, height=1024, width=1024,
                             num_inference_steps=25, sampler="dpm++",
                             guidance_scale=7.5)
        _ = np.asarray(imgs)
        t_gen = time.time() - t0
        log(f"SDXL gen 1024^2 incl decode B={len(prompts)}: {t_gen:.1f}s")
    except Exception as e:
        log(f"SDXL full gen (decode) FAILED: {type(e).__name__}: "
            f"{str(e)[:200]}")

    C = int(os.environ.get("SDXL_PROF_C", 2))
    P = int(os.environ.get("SDXL_PROF_P", 3))
    reqs = [
        {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
         "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
        for i in range(C)
    ]
    rng = np.random.RandomState(0)
    mean = rng.randn(C, 1, P, 128, 128, 4).astype(np.float32) * 0.13
    logvar = np.full(mean.shape, -6.0, np.float32)

    def stage1(steps, seed=0):
        hp_v = dataclasses.replace(hp, v_num_grad_steps=steps)
        t0 = time.time()
        z1, z2 = compute_z_sdxl_text_encoders(
            xl, reqs, hp_v, mean, logvar, rng=jax.random.PRNGKey(seed),
            height=1024, width=1024, verbose=False)
        _ = np.asarray(z1)
        return time.time() - t0

    try:
        if os.environ.get("SDXL_PROF_SKIP_S1"):
            raise RuntimeError("skipped (SDXL_PROF_SKIP_S1)")
        log("warm-up SDXL stage-1 (compile)")
        stage1(2)
        t3, t6 = stage1(3), stage1(6)
        slope = (t6 - t3) / 3
        log(f"SDXL dual-encoder stage-1 C={C} P={P} @1024^2: "
            f"{slope * 1e3:.0f} ms/step (t3={t3:.1f}s t6={t6:.1f}s)")
    except Exception as e:
        log(f"SDXL stage-1 FAILED: {type(e).__name__}: {str(e)[:200]}")

    xl = lat = imgs = None
    gc.collect()
    if os.environ.get("SDXL_PROF_SKIP_XKV"):
        log("skipping x-kv (SDXL_PROF_SKIP_XKV); done")
        return

    # ---- 3: SD x-kv edit ----
    from emcid_tpu.engine.cross_attn import apply_emcid_to_cross_attn
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet, sd_vae
    from emcid_tpu.models.pipeline import SDComponents
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.models.vae import AutoencoderKL
    from emcid_tpu.text import make_tiny_tokenizer

    log("building random SD pipeline for x-kv")
    tok = make_tiny_tokenizer(
        [f"w{i}" for i in range(8)] + ["photo", "of", "a", "an", "image"],
        model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(sd_vae(), dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    sd = SDComponents(
        tokenizer=tok, text_encoder=text,
        text_params=text.init_params(k),
        unet=unet, unet_params=unet.init_params(jax.random.fold_in(k, 1)),
        vae=vae, vae_params=vae.init_params(jax.random.fold_in(k, 2),
                                            image_size=512),
        schedule=sd_schedule(),
    )
    hp_sd = load_hparams(
        "dest_s-200_c-1.5_ly-7-11_lr-0.2_wd-5e-04_txt-align-0.01",
        hparams_dir="/root/reference/hparams")
    # x-kv Stage-1 supports exactly the reference's two supervision modes
    # (compute_z.py:2583-2605): esd with esd_mu, or sld_supervision — the
    # text-encoder hparams' ablate-dest objective would raise
    hp_sd = dataclasses.replace(hp_sd, v_num_grad_steps=10,
                                objective="esd", esd_mu=1.0)
    mean_sd = rng.randn(1, 1, 3, 64, 64, 4).astype(np.float32) * 0.18
    logvar_sd = np.full(mean_sd.shape, -6.0, np.float32)
    cov = np.eye(768, dtype=np.float32)
    xkv_reqs = [{"prompts": ["a photo of a {}", "an image of a {}", "{}"],
                 "source": "w1", "dest": "w2", "seed_train": 0}]
    log("warm-up x-kv (compile)")
    t0 = time.time()
    deltas, edited = apply_emcid_to_cross_attn(
        sd, xkv_reqs, hp_sd, latents_mean=mean_sd,
        latents_logvar=logvar_sd, cov=cov, verbose=False)
    t_cold = time.time() - t0
    t0 = time.time()
    deltas, edited = apply_emcid_to_cross_attn(
        sd, xkv_reqs, hp_sd, latents_mean=mean_sd,
        latents_logvar=logvar_sd, cov=cov, verbose=False)
    t_warm = time.time() - t0
    log(f"SD x-kv edit (1 request, 10 z-steps, all K/V projections): "
        f"cold {t_cold:.1f}s warm {t_warm:.1f}s")
    log("done")


if __name__ == "__main__":
    main()
