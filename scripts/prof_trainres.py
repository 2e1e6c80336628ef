"""TPU probe: training-resolution lever — cost + z-agreement at SD shapes.

The 5th guarded lever (tests/test_train_res.py): training images and
Stage-1 at ``EMCID_TPU_TRAIN_RES`` < the native 512.  FLOPs scale
quadratically (attention super-quadratically: 384 -> 2304-token level-0
self-attention vs 4096), so 384 is ≈0.56x the gen+Stage-1 cost — the
largest single protocol lever.  Decision data for flipping the default:

  1. generation + Stage-1 wall time at 512 vs 384 (dpm++-25, C=8, P=3,
     cosine-60 protocol, K=25 pool);
  2. z-delta agreement: per-concept cos/norm-ratio of (384-trained z) vs
     (512-trained z), compared against the Stage-1 MC seed-noise floor
     (same 512 images, different rng).  z lives in TEXT space, so the
     deltas are directly comparable across resolutions.

    nohup python -u scripts/prof_trainres.py > /tmp/trainres.log 2>&1 &
"""

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

    import emcid_tpu  # noqa: F401
    from emcid_tpu.engine.compute_z import (
        ConceptBatch, ZOptimizer, prepare_concept_batch,
    )
    from emcid_tpu.engine.training_images import generate_posteriors
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet, sd_vae
    from emcid_tpu.models.pipeline import SDComponents
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.models.vae import AutoencoderKL
    from emcid_tpu.text import make_tiny_tokenizer

    n_concepts, n_prompts = 8, 3
    words = [f"w{i}" for i in range(max(n_concepts + 1, 8))] + [
        "photo", "of", "a", "an", "image"]
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
        unet=unet, unet_params=up, vae=vae, vae_params=vp, schedule=sched)

    hp = EMCIDHyperParams.from_dict({
        "layers": [7, 8, 9, 10], "clamp_norm_factor": 1.5,
        "layer_selection": "all", "fact_token": "subject_last",
        "v_num_grad_steps": 100, "v_lr": 0.2,
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
    prompts = [p.format(r["source"]) for r in requests for p in r["prompts"]]
    seeds = list(range(len(prompts)))

    def gen(res):
        hw = res // 8
        t0 = time.time()
        mean, logvar = generate_posteriors(
            comps, prompts, seeds, batch_size=len(prompts),
            num_inference_steps=25, guidance_scale=7.5, height=res,
            width=res, sampler="dpm++")
        dt = time.time() - t0
        log(f"gen res={res}: {dt:.1f}s")
        return (mean.reshape(n_concepts, 1, n_prompts, hw, hw, 4),
                logvar.reshape(n_concepts, 1, n_prompts, hw, hw, 4)), dt

    optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                      eps_pool=25, lr_sched="cosine")

    def stage1(mlv, seed=0):
        mean, logvar = mlv
        arrays, _, _ = prepare_concept_batch(tok, requests, hp)
        arrays["latents_mean"] = np.asarray(mean)
        arrays["latents_logvar"] = np.asarray(logvar)
        batch = ConceptBatch(**{k: jnp.asarray(arrays[k])
                                for k in ConceptBatch._fields})
        t0 = time.time()
        zs, delta, z0, losses = optz.run(tp, up, batch,
                                         jax.random.PRNGKey(seed))
        d = np.asarray(delta)
        log(f"  stage1 seed{seed} hw={mean.shape[-2]}: "
            f"{time.time() - t0:.0f}s final10 "
            f"{np.asarray(losses)[-10:].mean():.5f}")
        return d

    def agree(a, b):
        a2, b2 = a.reshape(a.shape[0], -1), b.reshape(b.shape[0], -1)
        cos = np.sum(a2 * b2, -1) / (np.linalg.norm(a2, axis=-1)
                                     * np.linalg.norm(b2, axis=-1) + 1e-9)
        ratio = np.linalg.norm(b2, axis=-1) / (np.linalg.norm(a2, axis=-1)
                                               + 1e-9)
        return cos, ratio

    # warm-up both gen programs (compiles), then timed passes
    full, _ = gen(512)
    low, _ = gen(384)
    full, t_full = gen(512)
    low, t_low = gen(384)
    log(f"gen speedup 512->384: {t_full:.1f}s -> {t_low:.1f}s "
        f"({(1 - t_low / t_full) * 100:.0f}%)")

    t0 = time.time()
    d_full = stage1(full, seed=0)
    d_full_s1 = stage1(full, seed=1)  # MC noise floor (same images)
    d_low = stage1(low, seed=0)
    cos_f, r_f = agree(d_full, d_full_s1)
    log(f"NOISE FLOOR (512 images, rng0 vs rng1): "
        f"cos {cos_f.mean():.3f}±{cos_f.std():.3f} ratio {r_f.mean():.3f}")
    cos_t, r_t = agree(d_full, d_low)
    log(f"384 vs 512 (same rng): cos {cos_t.mean():.3f}±{cos_t.std():.3f}"
        f" (min {cos_t.min():.3f}) ratio {r_t.mean():.3f}±{r_t.std():.3f}")
    log("flip the default iff the 384 cos sits at/above the noise floor "
        "AND the norm ratio stays ~1 (z magnitude drives edit strength)")


if __name__ == "__main__":
    main()
