"""K-sweep for the eps_dest pool (PERF.md justification for K=25).

Measures, on the tiny CPU pipeline across seeds, how the pooled Stage-1
optimization tracks the reference-exact fresh-resample mode as the pool
size K grows: cosine of the final z delta vs fresh (same seed), the
delta-magnitude ratio, and the final loss.  The per-step COST side is
K-independent (PERF.md: pool ≈ 585 ms/step marginal vs 788 fresh, with a
one-time K x 210 ms build) — this sweep records the QUALITY side.

    python scripts/eps_pool_ksweep.py            # markdown table on stdout
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from emcid_tpu.runtime import force_cpu_platform
force_cpu_platform()

from emcid_tpu.engine.compute_z import (  # noqa: E402
    ConceptBatch, ZOptimizer, prepare_concept_batch,
)
from emcid_tpu.hparams import EMCIDHyperParams  # noqa: E402
from emcid_tpu.models.loader import build_tiny_pipeline  # noqa: E402

HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 60, "v_lr": 0.1,
    "v_weight_decay": 5e-4, "mom2_adjustment": True,
    "mom2_update_weight": 4000,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100,
    "mom2_dtype": "float32", "objective": "ablate-dest", "esd_mu": "None",
    "cal_text_repr_loss": True, "text_repr_loss_scale_factor": 0.01,
}

KS = (4, 8, 16, 25, 50)
SEEDS = (0, 1, 2)


def main():
    comps = build_tiny_pipeline(seed=0, words=["cat", "dog"])
    hp = EMCIDHyperParams.from_dict(HP)

    def batch(seed):
        reqs = [{"prompts": ["a photo of {}", "{}"], "source": "cat",
                 "dest": "dog", "seed_train": 1}]
        arrays, _, _ = prepare_concept_batch(comps.tokenizer, reqs, hp)
        rng = np.random.RandomState(seed)
        h = comps.unet.config.sample_size
        arrays["latents_mean"] = (
            rng.randn(1, 2, 2, h, h, 4).astype(np.float32) * 0.2)
        arrays["latents_logvar"] = np.full(
            (1, 2, 2, h, h, 4), -6.0, np.float32)
        import jax.numpy as jnp

        return ConceptBatch(**{k: jnp.asarray(arrays[k])
                               for k in ConceptBatch._fields})

    def run(pool, seed):
        optz = ZOptimizer(comps.text_encoder, comps.unet, comps.schedule,
                          hp, layer=hp.layers[-1], eps_pool=pool)
        zs, delta, z0, losses = optz.run(
            comps.text_params, comps.unet_params, batch(seed),
            jax.random.PRNGKey(seed))
        return np.asarray(delta), float(np.asarray(losses)[-5:].mean())

    fresh = {s: run(0, s) for s in SEEDS}
    print("| K | cos(delta, fresh) mean±std | |delta| ratio | "
          "final loss (fresh {:.4f}) |".format(
              np.mean([fresh[s][1] for s in SEEDS])))
    print("|---|---|---|---|")
    for K in KS:
        cos, ratios, losses = [], [], []
        for s in SEEDS:
            d, loss = run(K, s)
            f = fresh[s][0].ravel()
            dr = d.ravel()
            cos.append(float(dr @ f / (np.linalg.norm(dr)
                                       * np.linalg.norm(f) + 1e-9)))
            ratios.append(float(np.linalg.norm(dr) / np.linalg.norm(f)))
            losses.append(loss)
        print(f"| {K} | {np.mean(cos):.3f}±{np.std(cos):.3f} "
              f"| {np.mean(ratios):.3f} | {np.mean(losses):.4f} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
