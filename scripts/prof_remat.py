"""TPU experiment: Stage-1 step time vs remat policy (full / none / dots).

The UNet weights are frozen in Stage-1, so the backward only needs input
gradients; if residuals fit HBM, dropping jax.checkpoint removes one full
forward recompute per step (~4 -> ~3 forward-equivalents).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_remat.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import emcid_tpu  # noqa: F401
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.text import make_tiny_tokenizer

    n_concepts, steps, n_prompts, latent_hw = 8, 20, 3, 64
    words = [f"w{i}" for i in range(max(n_concepts + 1, 8))] + [
        "photo", "of", "a", "an", "image"]
    tok = make_tiny_tokenizer(words, model_max_length=77)
    text = CLIPTextEncoder(SD_V14_TEXT, dtype=jnp.bfloat16)
    tp = text.init_params(jax.random.PRNGKey(0))
    unet = UNet2DCondition(sd_v14_unet(), dtype=jnp.bfloat16)
    up = unet.init_params(jax.random.PRNGKey(1))
    sched = sd_schedule()
    hp = EMCIDHyperParams.from_dict({
        "layers": [7, 8, 9, 10], "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": steps, "v_lr": 0.2,
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
    mean = rng.randn(n_concepts, 1, n_prompts, latent_hw, latent_hw, 4).astype(
        np.float32) * 0.18
    logvar = np.full(mean.shape, -6.0, np.float32)
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

    for remat in ["none", "dots", "full"]:
        try:
            optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                              remat=remat)
            t0 = time.time()
            zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(0))
            _ = np.asarray(zs)
            t_compile = time.time() - t0
            t0 = time.time()
            zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(1))
            _ = np.asarray(zs)
            dt = time.time() - t0
            print(f"remat={remat:5s}: {dt:.2f}s for {steps} steps "
                  f"({dt / steps * 1e3:.0f} ms/step; compile+run {t_compile:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"remat={remat:5s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
