"""TPU experiment: Stage-1 step time vs remat policy and concept-block size.

The UNet weights are frozen in Stage-1, so the backward only needs input
gradients; if residuals fit HBM, dropping jax.checkpoint removes one full
forward recompute per step (~4 -> ~3 forward-equivalents).  "level0"
(round 4) stores everything EXCEPT the full-resolution block interiors
(checkpoint_name seams) — ~+7% expected step cost for most of the HBM
back, targeting C=12-16 blocks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/prof_remat.py \
        [comma-separated C list, default 8] [comma-separated remats]
e.g.    ... scripts/prof_remat.py 8,12 none,level0
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

    steps, n_prompts, latent_hw = 20, 3, 64
    c_list = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1
                               else "8").split(",")]
    remats = (sys.argv[2] if len(sys.argv) > 2
              else "none,dots,full").split(",")
    n_max = max(c_list)
    words = [f"w{i}" for i in range(max(n_max + 1, 8))] + [
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
    rng = np.random.RandomState(0)
    for n_concepts in c_list:
        requests = [
            {"prompts": ["a photo of a {}", "an image of a {}", "{}"],
             "source": f"w{i}", "dest": f"w{i + 1}", "seed_train": i}
            for i in range(n_concepts)
        ]
        mean = rng.randn(n_concepts, 1, n_prompts, latent_hw, latent_hw,
                         4).astype(np.float32) * 0.18
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

        for remat in remats:
            try:
                optz = ZOptimizer(text, unet, sched, hp,
                                  layer=hp.layers[-1], remat=remat)
                optz.hbm_fallback = False  # we WANT the OOM reported
                t0 = time.time()
                zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(0))
                _ = np.asarray(zs)
                t_compile = time.time() - t0
                t0 = time.time()
                zs, *_ = optz.run(tp, up, batch, jax.random.PRNGKey(1))
                _ = np.asarray(zs)
                dt = time.time() - t0
                print(f"C={n_concepts:2d} remat={remat:6s}: {dt:.2f}s for "
                      f"{steps} steps ({dt / steps * 1e3:.0f} ms/step, "
                      f"{dt / steps / n_concepts * 1e3:.1f} ms/step/concept; "
                      f"compile+run {t_compile:.0f}s)", flush=True)
            except Exception as e:
                print(f"C={n_concepts:2d} remat={remat:6s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
