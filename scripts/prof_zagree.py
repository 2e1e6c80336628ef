"""TPU probe #2: z-agreement between the const-100 reference protocol and
cosine fast-protocol candidates at SD shapes (random weights).

Runs each protocol on the SAME batch and seed and reports per-concept
cosine / norm ratio of the resulting z deltas — the direct measure of
whether the shortened schedule produces the same edit.  Reuses the
compiled programs from prof_zsched.py (lr is scan data).

    nohup python -u scripts/prof_zagree.py > /tmp/zagree.log 2>&1 &
"""

import dataclasses
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
    from emcid_tpu.hparams import EMCIDHyperParams
    from emcid_tpu.models import CLIPTextEncoder, SD_V14_TEXT
    from emcid_tpu.models.configs import sd_v14_unet
    from emcid_tpu.models.scheduler import sd_schedule
    from emcid_tpu.models.unet import UNet2DCondition
    from emcid_tpu.text import make_tiny_tokenizer

    n_concepts, n_prompts, hw = 8, 3, 64
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
    arrays, _, _ = prepare_concept_batch(tok, requests, hp)
    rng = np.random.RandomState(0)
    arrays["latents_mean"] = rng.randn(
        n_concepts, 1, n_prompts, hw, hw, 4).astype(np.float32) * 0.18
    arrays["latents_logvar"] = np.full(
        (n_concepts, 1, n_prompts, hw, hw, 4), -6.0, np.float32)
    batch = ConceptBatch(**{k: jnp.asarray(arrays[k])
                            for k in ConceptBatch._fields})

    def deltas(sched_name, frac=0.6, peak=2.0, seed=0):
        optz = ZOptimizer(text, unet, sched, hp, layer=hp.layers[-1],
                          eps_pool=25, lr_sched=sched_name,
                          z_frac=frac, z_peak=peak)
        t0 = time.time()
        zs, delta, z0, losses = optz.run(tp, up, batch,
                                         jax.random.PRNGKey(seed))
        d = np.asarray(delta)
        losses = np.asarray(losses)
        log(f"  ran {sched_name} f{frac} p{peak} s{seed}: {len(losses)} "
            f"steps {time.time() - t0:.0f}s final10 "
            f"{losses[-10:].mean():.5f}")
        return d

    def agree(a, b):
        a2 = a.reshape(a.shape[0], -1)
        b2 = b.reshape(b.shape[0], -1)
        cos = np.sum(a2 * b2, -1) / (np.linalg.norm(a2, axis=-1)
                                     * np.linalg.norm(b2, axis=-1) + 1e-9)
        ratio = np.linalg.norm(b2, axis=-1) / (np.linalg.norm(a2, axis=-1)
                                               + 1e-9)
        return cos, ratio

    log("reference const-100")
    ref = deltas("const")
    ref_s1 = deltas("const", seed=1)
    cos0, r0 = agree(ref, ref_s1)
    log(f"const-100 seed0 vs seed1 (MC noise floor): "
        f"cos {cos0.mean():.3f}±{cos0.std():.3f} ratio {r0.mean():.3f}")
    for frac, peak in ((0.6, 3.0), (0.6, 2.5), (0.6, 2.0), (0.7, 2.5)):
        d = deltas("cosine", frac, peak)
        cos, r = agree(ref, d)
        log(f"cosine f{frac} p{peak} vs const-100: "
            f"cos {cos.mean():.3f}±{cos.std():.3f} "
            f"(min {cos.min():.3f}) ratio {r.mean():.3f}")


if __name__ == "__main__":
    main()
