"""Benchmark: end-to-end EMCID concept-edit throughput on real hardware.

Measures the full two-stage edit — Stage-1 vmapped z-optimization
(v_num_grad_steps Adam steps, 2 UNet forwards per prompt per step at SD
shapes) + Stage-2 fused multi-layer closed-form insert — for a block of
concepts on the SD-v1.4-shaped models (CLIP-L text encoder, 860M UNet,
bf16), with training images provided (the reference's
``training_img_paths`` real-image mode, compute_z.py:384-391), so the number
excludes training-image generation (reported separately once the eval
harness benches land).

Baseline: the driver north star — 1,000 concepts in 600 s on a v5e-8
(BASELINE.json).  We report single-chip throughput; ``vs_baseline`` is the
projected 8-chip speedup over that target assuming linear data-parallel
scaling of the concept axis (which dryrun_multichip validates structurally):

    vs_baseline = (concepts_per_sec * 8) / (1000 / 600)

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401  (enables the persistent compile cache)
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.engine.emcid import execute_emcid_text_encoder
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.text import make_tiny_tokenizer

    n_concepts = int(os.environ.get("BENCH_CONCEPTS", 8))
    grad_steps = int(os.environ.get("BENCH_GRAD_STEPS", 100))
    n_prompts = 3
    latent_hw = 64  # 512x512 images

    words = [f"w{i}" for i in range(max(n_concepts + 1, 8))] + [
        "photo", "of", "a", "an", "image",
    ]
    tok = make_tiny_tokenizer(words, model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    tp = text.init_params(jax.random.PRNGKey(0))
    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(1))
    sched = sd_schedule()

    hp = EMCIDHyperParams.from_dict({
        "layers": [7, 8, 9, 10], "clamp_norm_factor": 1.5,
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
    # pre-encoded training-image latents (real-image mode)
    mean = rng.randn(n_concepts, 1, n_prompts, latent_hw, latent_hw, 4).astype(
        np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
    covs = []
    for _ in hp.layers:
        A = rng.randn(4096, 3072).astype(np.float32)
        covs.append((A.T @ A / 4096).astype(np.float32))

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
    optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1])

    # warm-up/compile (persistent-cached across runs)
    warm_hp_steps = hp.v_num_grad_steps
    zs, delta, z0, losses = optz.run(tp, up, batch, jax.random.PRNGKey(0))
    zs = np.asarray(zs)
    _ = execute_emcid_text_encoder(
        text, tp, tok, requests, hp, zs=zs, covs=covs, verbose=False)

    # timed run (host materialization — block_until_ready does not reliably
    # synchronize on the tunneled TPU backend)
    t0 = time.time()
    zs, delta, z0, losses = optz.run(tp, up, batch, jax.random.PRNGKey(1))
    zs = np.asarray(zs)
    t_stage1 = time.time() - t0
    t0 = time.time()
    deltas, new_params = execute_emcid_text_encoder(
        text, tp, tok, requests, hp, zs=zs, covs=covs, verbose=False)
    jax.block_until_ready(jax.tree.leaves(new_params)[0])
    t_stage2 = time.time() - t0

    total = t_stage1 + t_stage2
    rate = n_concepts / total  # concepts/s on this chip
    target_rate = 1000.0 / 600.0  # north star: 1000 concepts / 10 min / 8 chips
    vs_baseline = (rate * 8) / target_rate

    print(json.dumps({
        "metric": (
            f"EMCID two-stage edit throughput, SD-v1.4 shapes, "
            f"{n_concepts} concepts x {grad_steps} z-steps, 1 chip "
            f"(stage1 {t_stage1:.1f}s + stage2 {t_stage2:.1f}s)"
        ),
        "value": round(rate, 4),
        "unit": "concepts/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
