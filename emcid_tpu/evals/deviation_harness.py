"""Shared tiny-AICE deviation-guard harness.

The five guarded protocol deviations (PERF.md levers: dpm++-25 training
images, eps_dest pool K=25, cosine fast z, CFG-interval 0.6, train_res
384) ship on a functional bar: multi-seed AICE metric deltas (efficacy /
generalization / specificity, the metrics the protocol actually serves —
reference experiments/emcid_test.py:991-1079) must sit inside the
reference protocol's own noise.  This module is the single
implementation of that bar, consumed by

* ``tests/test_deviation_guards.py`` — per-lever CPU guards, the
  NEGATIVE CONTROLS (deliberately broken protocols that must FAIL the
  band — proof the harness can reject anything at all), and the
  COMPOUND guard (all five levers on vs the all-off reference protocol,
  the configuration the product actually ships);
* ``scripts/guard_bands.py`` — measures/persists the bands, per-lever
  deltas, and the null-replica noise recorded in PERF.md;
* ``cli/validate.py`` (levers subcommand) — re-runs the same decision
  rules against a real checkpoint (RUNBOOK real-weight certification).

Harness regime (chosen so every lever ENGAGES — measured round 5,
PERF.md "deviation-guard bands"): Stage-1 / training-image generation at
``N_STEPS=10`` sampler steps (cfg_interval 0.6 then truncates guidance
for the 4-step tail; dpm++ vs pndm actually produce different images —
at the round-3/4 regime of 2 steps both levers were bitwise no-ops), a
4-class scorer over the tiny pipeline's own word list (the product's
ImageNet-shaped 1000-class head crushes tiny-image deltas into ~1e-6
softmax moves — measured vacuous: even a z*=0.5 corruption scored 0.0),
eval generation at 2 steps 16x16 (paired away by seed), and a STRONG
edit (mom2_update_weight 50, v_lr 0.3, 16 grad steps): at the
reference's CLIP-scale preservation weight (4000) the tiny edit moves
eval pixels by only ~0.1/255 — below uint8 quantization — and no scorer
can separate protocols through images that barely change (measured:
0.10 -> 11.0 pixel response, scripts/guard_bands.py probes).

Statistic: pair by ``seed_train`` (same training images + eval seeds on
both sides) and test the mean paired metric delta against the exact
protocol's OWN Monte-Carlo noise, estimated from NULL REPLICAS — the
reference-exact protocol re-run with different Stage-1 eps draws
(``rng_seed`` 1, 2 vs 0; reference compute_z.py:493-534 resamples
eps_dest fresh every step, so eps-draw noise is intra-protocol noise,
not a deviation).  For each metric

    band = NULL_SIGMAS * rms(null paired deltas) / sqrt(n_seeds) + ABS_FLOOR
    PASS iff |mean paired delta over seeds| <= band

(the test statistic is a SEED-MEAN, so the null rms is scaled to the
mean's standard error — the round-5 first measurement used the raw
single-pair rms and was ~sqrt(3) too wide: both negative controls
passed it; with SE scaling both fail and the levers at PRODUCT ratios
still pass, scripts/guard_bands.py + PERF.md).

The null-replica denominator is what gives the harness teeth: the
negative controls (z scaled x0.5; Stage-1 truncated 10-vs-50) must BREAK
the band (tests/test_deviation_guards.py::test_negative_control_*) —
a band too wide to reject a corrupted protocol proves nothing about the
levers it passes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

SEEDS = (0, 1, 2)
# eval generation (paired away by seed; 2 steps is enough for the edit
# to dominate pixel content — measured img|delta| ~0.07 for the controls)
GEN = dict(num_inference_steps=2, height=16, width=16)
# Stage-1 / training-image sampler steps: >= 10 so the cfg-interval and
# sampler levers are real code paths, not no-ops
N_STEPS = 10

NULL_RNGS = (1, 2, 3)  # exact-protocol replicas vs rng_seed=0
NULL_SIGMAS = 3.0
ABS_FLOOR = 2e-3

TINY_HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 16, "v_lr": 0.3,
    "v_weight_decay": 5e-4, "mom2_adjustment": True,
    "mom2_update_weight": 50,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered", "mom2_n_samples": 100,
    "mom2_dtype": "float32", "objective": "ablate-dest", "esd_mu": "None",
    "cal_text_repr_loss": True, "text_repr_loss_scale_factor": 0.01,
}

# Lever registry: per guarded deviation, the product-default and
# reference-exact apply kwargs on the tiny harness.  train_res tests the
# PRODUCT ratio (12/16 = 384/512 = 0.75x; the 0.5x ratio 8-vs-16 FAILS
# the SE band — measured round 5, guard_bands.json — which is the guard
# working: the product never ships a 2x resolution cut); train_steps
# 5-vs-10 mirrors the dpm++ lever's 25-vs-50.
LEVERS: Dict[str, Dict] = {
    "eps_pool": dict(default=dict(eps_dest_pool=25),
                     exact=dict(eps_dest_pool=0)),
    "train_sampler": dict(default=dict(train_sampler="dpm++",
                                       train_steps=5),
                          exact=dict(train_sampler="pndm")),
    "cfg_interval": dict(default=dict(cfg_interval=0.6),
                         exact=dict(cfg_interval=1.0)),
    "train_res": dict(default=dict(train_res=12),
                      exact=dict(train_res=16)),
    "z_sched": dict(hp_over={"v_num_grad_steps": 50},
                    default=dict(z_sched="cosine", eps_dest_pool=0),
                    exact=dict(z_sched="const", eps_dest_pool=0)),
}

# The configuration the product actually ships vs the reference protocol
# (VERDICT r4 missing #2: no measurement compared all-5-on vs all-5-off).
# 50 grad steps so the cosine schedule engages and the K=25 pool amortizes
# (both gates in engine/editor.py); pool=25 < 50 steps, res 12 = the
# product 0.75x ratio, cfg 0.6, dpm++ at half the pndm step count.
COMPOUND = dict(
    hp_over={"v_num_grad_steps": 50},
    default=dict(train_sampler="dpm++", train_steps=5, eps_dest_pool=25,
                 z_sched="cosine", cfg_interval=0.6, train_res=12),
    exact=dict(train_sampler="pndm", eps_dest_pool=0, z_sched="const",
               cfg_interval=1.0, train_res=16),
)

# Negative controls: protocols broken ON PURPOSE.  Each must FAIL the
# band — if it passes, the band is vacuous and the lever guards prove
# nothing (VERDICT r4 weak #1).
CONTROLS: Dict[str, Dict] = {
    # z halved after Stage-1: Stage-2 then inserts a target far from the
    # optimized representation — a corrupted edit the guard must reject
    "z_scaled_half": dict(
        broken=dict(z_transform=lambda zs: 0.5 * zs, eps_dest_pool=0),
        exact=dict(eps_dest_pool=0),
    ),
    # Stage-1 truncated to 1/5 the reference step count at const lr: the
    # under-optimized delta weakens the edit — must also be rejected
    "stage1_truncated": dict(
        broken=dict(hp_over={"v_num_grad_steps": 10},
                    z_sched="const", eps_dest_pool=0),
        exact=dict(hp_over={"v_num_grad_steps": 50},
                   z_sched="const", eps_dest_pool=0),
    ),
}


def make_guard_scorer(num_labels: int = 4, seed: int = 0):
    """4-class tiny-ViT scorer over the tiny pipeline's own word list.

    The PRODUCT scorer keeps the reference's ImageNet-shaped 1000-label
    head (evals/scorers.py make_vit_scorer — real benchmark class ids go
    up to 999); for the GUARD harness a 1000-way softmax over random
    logits is ~uniform and moves ~1e-6 per image delta, drowning every
    protocol effect under the floor.  Over 4 classes the same tower
    yields O(0.25) probabilities with O(1e-2) sensitivity to the edits.
    """
    from emcid_tpu.evals.scorers import make_vit_scorer
    from emcid_tpu.models.vision import TINY_VIT

    cfg = dataclasses.replace(TINY_VIT, num_labels=num_labels)
    return make_vit_scorer(config=cfg, seed=seed)


def edit_request(seed: int) -> Dict:
    return {"prompts": ["a photo of {}", "{}"], "source": "cat",
            "dest": "dog", "seed_train": seed}


def metrics(comps_edited, scorer, seed: int,
            gen_kwargs: Optional[dict] = None) -> np.ndarray:
    """(efficacy, generalization, specificity) — the AICE triple on the
    tiny pipeline: source prompts scored under the dest class (efficacy),
    held-out prompt phrasing likewise (generalization), untouched-concept
    images under their own class (specificity)."""
    from emcid_tpu.evals.iceb import generate_cal_cls_score
    from emcid_tpu.evals.scorers import calculate_single_cls_score
    from emcid_tpu.models.pipeline import generate

    gk = dict(GEN, **(gen_kwargs or {}))
    eval_req = {"prompts": ["a photo of {}", "{}"], "source": "cat",
                "dest": "dog", "source id": 1, "dest id": 2,
                "seeds": [seed, seed + 1]}
    train = generate_cal_cls_score(
        comps_edited, scorer, [eval_req], is_edited=True, gen_kwargs=gk)
    val_req = dict(eval_req, prompts=["an image of a {}"],
                   seeds=[seed + 2])
    val = generate_cal_cls_score(
        comps_edited, scorer, [val_req], is_edited=True, gen_kwargs=gk)
    spec_imgs = generate(comps_edited, ["a photo of bird"] * 2,
                         [seed + 3, seed + 4], **gk)
    spec = calculate_single_cls_score(scorer, spec_imgs, 3)
    return np.array([train["source_dest_scores"][0],
                     val["source_dest_scores"][0],
                     float(spec)])


def run_mode(
    comps,
    scorer,
    stats_dir,
    seeds: Sequence[int] = SEEDS,
    hp_over: Optional[dict] = None,
    z_transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    gen_kwargs: Optional[dict] = None,
    rng_seed: int = 0,
    n_steps: int = N_STEPS,
    **apply_over,
) -> np.ndarray:
    """(seeds, 3) metric rows for one protocol mode.

    ``rng_seed`` keys the Stage-1 eps draws (engine/editor.py:425) — the
    null replicas vary it to estimate intra-protocol MC noise.
    ``z_transform`` (negative-control seam): applied to the stacked
    Stage-1 z vectors between Stage 1 and Stage 2 — the same covs/zs/
    execute sequence as ``apply_emcid`` (engine/editor.py:496-521), minus
    the UCE hybrid this harness never enables.
    """
    from emcid_tpu.engine.editor import (
        apply_emcid,
        compute_zs_for_requests,
        resolve_covariances,
    )
    from emcid_tpu.engine.emcid import execute_emcid_text_encoder
    from emcid_tpu.hparams import EMCIDHyperParams

    hp = EMCIDHyperParams.from_dict(dict(TINY_HP, **(hp_over or {})))
    rows = []
    for seed in seeds:
        requests = [edit_request(seed)]
        if z_transform is None:
            edited, _ = apply_emcid(
                comps, requests, hp, stats_dir=stats_dir,
                num_inference_steps=n_steps, rng_seed=rng_seed,
                verbose=False, **apply_over)
        else:
            covs = resolve_covariances(comps, hp, stats_dir=stats_dir,
                                       verbose=False)
            zs = compute_zs_for_requests(
                comps, requests, hp, num_inference_steps=n_steps,
                rng_seed=rng_seed, verbose=False, **apply_over)
            zs = np.asarray(z_transform(np.asarray(zs)))
            _, new_params = execute_emcid_text_encoder(
                comps.text_encoder, comps.text_params, comps.tokenizer,
                requests, hp, zs=jnp.asarray(zs), covs=covs, verbose=False)
            edited = comps.replace_text_params(new_params)
        rows.append(metrics(edited, scorer, seed, gen_kwargs=gen_kwargs))
    return np.stack(rows)  # (seeds, 3 metrics)


def null_band(null_rows: Sequence[np.ndarray],
              exact: np.ndarray) -> np.ndarray:
    """Per-metric acceptance band from exact-protocol null replicas.

    ``null_rows``: list of (seeds, 3) metric arrays from the EXACT
    protocol at different ``rng_seed`` values; ``exact`` is the
    rng_seed=0 run every candidate is paired against.  The band is
    NULL_SIGMAS x the standard error of a seed-mean paired delta
    (rms of the single-pair null deltas / sqrt(n_seeds)) + ABS_FLOOR.
    """
    deltas = np.stack([r - exact for r in null_rows])  # (R, seeds, 3)
    rms = np.sqrt((deltas ** 2).mean(axis=(0, 1)))
    return NULL_SIGMAS * rms / np.sqrt(deltas.shape[1]) + ABS_FLOOR


def paired_report(default: np.ndarray, exact: np.ndarray,
                  band: np.ndarray) -> Dict:
    """Per-metric paired deltas vs the null band, plus the verdict."""
    paired = default - exact  # (seeds, metrics)
    mean_delta = np.abs(paired.mean(axis=0))
    return dict(
        metrics=("efficacy", "generalization", "specificity"),
        mean_delta=mean_delta, band=np.asarray(band),
        sigma_paired=paired.std(axis=0), ok=mean_delta <= band,
        default_mean=default.mean(axis=0), exact_mean=exact.mean(axis=0),
        rows_default=default, rows_exact=exact,
    )


def assert_within_noise(default: np.ndarray, exact: np.ndarray,
                        band: np.ndarray, label: str) -> Dict:
    """Every metric must sit inside the null band (lever/compound)."""
    rep = paired_report(default, exact, band)
    for i, name in enumerate(rep["metrics"]):
        assert rep["ok"][i], (
            f"{label}: {name} paired delta {rep['mean_delta'][i]:.5f} "
            f"exceeds the null band {rep['band'][i]:.5f} "
            f"(default={rep['default_mean']}, exact={rep['exact_mean']})")
    return rep


def assert_outside_noise(broken: np.ndarray, exact: np.ndarray,
                         band: np.ndarray, label: str) -> Dict:
    """Negative control: at least one metric must BREAK the band — a
    harness that cannot reject a deliberately corrupted protocol proves
    nothing about the levers it passes."""
    rep = paired_report(broken, exact, band)
    assert not rep["ok"].all(), (
        f"{label}: deliberately broken protocol passed every null band — "
        f"the guard harness is vacuous (deltas={rep['mean_delta']}, "
        f"bands={rep['band']})")
    return rep


# ---------------------------------------------------------------------------
# SDXL clone (VERDICT r4 next #7a): the SAME statistic on the SDXL path,
# pre-registered BEFORE any 1024² on-chip measurement exists.  SDXL's
# deviation scope is asymmetric by design: cfg_interval SHIPS for SDXL
# (sdxl_training_latents resolves the product default), train_res is
# GATED OFF for every native size but 512 (engine/editor.resolve_train_res)
# — the train-res rule below is the acceptance bar a future flip must
# clear, not a guard on current behavior.
# ---------------------------------------------------------------------------

# regime probed like the SD one (scripts/guard_bands.py probes): at
# (32 steps, lr 0.15, mom2 weight 20) the z*0.5 corruption moves metrics
# 5x the rng-null (0.038 vs 0.008); twitchier regimes (12 steps lr 0.3)
# bury the corruption under eps noise
SDXL_TINY_HP = {
    "layers": [0, 1], "layers_2": [1, 2], "clamp_norm_factor": 1.5,
    "layer_selection": "all", "fact_token": "subject_last",
    "mom2_update_weight": 20, "mom2_update_weight_2": 20,
    "rewrite_module_tmp": "text_model.encoder.layers.{}.mlp.fc2",
    "layer_module_tmp": "text_model.encoder.layers.{}",
    "mlp_module_tmp": "text_model.encoder.layers.{}.mlp",
    "attn_module_tmp": "text_model.encoder.layers.{}.self_attn",
    "ln_f_module": "text_model.final_layer_norm",
    "mom2_dataset": "ccs_filtered", "mom2_n_samples": 30,
    "mom2_dtype": "float32", "v_num_grad_steps": 32, "v_lr": 0.15,
    "v_weight_decay": 8e-3, "mom2_adjustment": True,
    "objective": "ablate-dest", "esd_mu": "None",
    "cal_text_repr_loss": True, "text_repr_loss_scale_factor": 0.01,
}

SDXL_LEVERS: Dict[str, Dict] = {
    # shipping for SDXL (same resolve as SD) — guarded NOW
    "cfg_interval": dict(default=dict(cfg_interval=0.6),
                         exact=dict(cfg_interval=1.0)),
    # NOT shipping (gated off until 1024² measurements); the rule a flip
    # must pass, at the product 0.75x ratio
    "train_res": dict(default=dict(train_res=12),
                      exact=dict(train_res=16)),
}


def make_sdxl_covs(components, seed: int = 0):
    """Random PSD covariances for both encoders' edit layers (the tiny
    harness has no caption corpus; Stage-2 only needs a well-conditioned
    C — same construction as bench.py)."""
    rng = np.random.RandomState(seed)

    def cov(inter, n):
        out = []
        for _ in range(n):
            A = rng.randn(max(2 * inter, 64), inter).astype(np.float32)
            out.append(A.T @ A / A.shape[0])
        return out

    i1 = components.text_encoder.config.intermediate_size
    i2 = components.text_encoder_2.config.intermediate_size
    hp = SDXL_TINY_HP
    return cov(i1, len(hp["layers"])), cov(i2, len(hp["layers_2"]))


def sdxl_metrics(comps_edited, scorer, seed: int) -> np.ndarray:
    """The AICE triple via the SDXL sampler (mirrors ``metrics``)."""
    from emcid_tpu.evals.scorers import calculate_single_cls_score
    from emcid_tpu.models.sdxl import generate_sdxl

    gk = dict(GEN)

    def score(prompts, seeds, cls):
        imgs = generate_sdxl(comps_edited, prompts, seeds, **gk)
        return calculate_single_cls_score(scorer, imgs, cls)

    eff = score(["a photo of cat", "cat"], [seed, seed + 1], 2)
    gen = score(["an image of a cat"], [seed + 2], 2)
    spec = score(["a photo of dog", "dog"], [seed + 3, seed + 4], 3)
    return np.array([float(eff), float(gen), float(spec)])


def sdxl_run_mode(
    comps,
    scorer,
    seeds: Sequence[int] = SEEDS,
    hp_over: Optional[dict] = None,
    z_transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    rng_seed: int = 0,
    n_steps: int = N_STEPS,
    covs=None,
    cfg_interval: Optional[float] = None,
    train_res: Optional[int] = None,
) -> np.ndarray:
    """(seeds, 3) SDXL metric rows for one protocol mode — the SDXL
    mirror of ``run_mode`` (training latents → joint Stage-1 → dual
    Stage-2), with the same rng-null and z-corruption seams."""
    import jax

    from emcid_tpu.engine.sdxl import (
        apply_emcid_to_sdxl_text_encoders,
        compute_z_sdxl_text_encoders,
        execute_emcid_sd_xl_text_encoders,
        sdxl_training_latents,
    )
    from emcid_tpu.hparams import EMCIDXLHyperParams

    hp = EMCIDXLHyperParams.from_dict(dict(SDXL_TINY_HP, **(hp_over or {})))
    covs_1, covs_2 = covs if covs is not None else make_sdxl_covs(comps)
    native = comps.unet.config.sample_size * comps.vae_scale
    res = int(train_res or native)
    rows = []
    for seed in seeds:
        requests = [edit_request(seed)]
        mean, logvar = sdxl_training_latents(
            comps, requests, hp, height=res, width=res,
            num_inference_steps=n_steps, cfg_interval=cfg_interval)
        if z_transform is None:
            _, _, edited = apply_emcid_to_sdxl_text_encoders(
                comps, requests, hp, mean, logvar, covs_1, covs_2,
                height=res, width=res, rng_seed=rng_seed, verbose=False)
        else:
            z1, z2 = compute_z_sdxl_text_encoders(
                comps, requests, hp, mean, logvar,
                rng=jax.random.PRNGKey(rng_seed),
                height=res, width=res, verbose=False)
            z1 = np.asarray(z_transform(np.asarray(z1)))
            z2 = np.asarray(z_transform(np.asarray(z2)))
            _, _, edited = execute_emcid_sd_xl_text_encoders(
                comps, requests, hp, z1, z2, covs_1, covs_2, verbose=False)
        rows.append(sdxl_metrics(edited, scorer, seed))
    return np.stack(rows)
