"""TPU probe: Stage-1 lr-schedule variants at SD shapes (round-4 lever).

Measures, in ONE process (tunnel discipline: one TPU client, no kills),
the wall time and final-loss regime of the const-lr reference protocol vs
cosine fast protocols.  The lr enters the step program as scan data, so
every variant shares the same compiled chunk program — the only compiles
are the 20-step chunk + the pool build.

    nohup python -u scripts/prof_zsched.py > /tmp/zsched.log 2>&1 &
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

    import emcid_tpu  # noqa: F401 (persistent compile cache)
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

    import dataclasses

    def run(tag, steps, sched_name, frac=0.6, peak=2.0, seed=0):
        hp_v = dataclasses.replace(hp, v_num_grad_steps=steps)
        optz = ZOptimizer(text, unet, sched, hp_v, layer=hp.layers[-1],
                          eps_pool=25, lr_sched=sched_name,
                          z_frac=frac, z_peak=peak)
        t0 = time.time()
        zs, delta, z0, losses = optz.run(tp, up, batch,
                                         jax.random.PRNGKey(seed))
        losses = np.asarray(losses)  # host sync
        dt = time.time() - t0
        eff = len(losses)
        log(f"{tag}: {eff} steps in {dt:.1f}s ({dt / max(eff, 1) * 1e3:.0f} "
            f"ms/step incl pool) final10 {losses[-10:].mean():.5f} "
            f"first5 {losses[:5].mean():.5f}")
        return dict(tag=tag, steps=eff, seconds=dt,
                    final10=float(losses[-10:].mean()),
                    losses=losses)

    log("warm-up const-100 (compiles: pool build + 20-step chunk)")
    run("warmup", 100, "const")
    log("timed variants")
    results = [
        run("const-100 (reference)", 100, "const"),
        run("const-60", 60, "const"),
        run("cosine-60 f0.6 p2.0", 100, "cosine", 0.6, 2.0),
        run("cosine-40 f0.4 p2.0", 100, "cosine", 0.4, 2.0),
        run("cosine-60 f0.6 p1.5", 100, "cosine", 0.6, 1.5),
        run("cosine-60 f0.6 p3.0", 100, "cosine", 0.6, 3.0),
        # seed robustness for the leading candidate
        run("const-100 seed1", 100, "const", seed=1),
        run("cosine-60 f0.6 p2.0 seed1", 100, "cosine", 0.6, 2.0, seed=1),
    ]
    ref = results[0]["final10"]
    log("--- summary (target: final10 <= const-100 within noise) ---")
    for r in results:
        log(f"{r['tag']:>28}: {r['steps']:3d} steps {r['seconds']:6.1f}s "
            f"final10 {r['final10']:.5f} ({r['final10'] / ref:+.2%} of ref)")
    np.savez("/tmp/zsched_losses.npz",
             **{r["tag"]: r["losses"] for r in results})


if __name__ == "__main__":
    main()
