"""Quantitative guards for the two product-default algorithmic deviations
(PERF.md round-3 levers):

  1. finite eps_dest pool (K=25) vs the reference's fresh per-step eps_dest
     forward (compute_z.py:493-534);
  2. DPM++(2M)@25 training images vs the reference's PNDM@50
     (compute_z.py:384-418).

Each guard runs the REAL tiny-AICE metric path (generate → ViT cls scores,
evals.iceb.generate_cal_cls_score) for the product default and the
reference-exact mode across several seeds, pairing by seed (same training
images / z init), and bounds the mean paired metric delta by the fresh
mode's own across-seed noise.  This asserts benchmark METRICS, not update
geometry (the cos>0.7 guards in test_eps_pool.py remain as fast smoke)."""

import numpy as np
import pytest

from emcid_tpu.engine.editor import apply_emcid
from emcid_tpu.evals.iceb import generate_cal_cls_score
from emcid_tpu.evals.scorers import calculate_single_cls_score, make_vit_scorer
from emcid_tpu.hparams import EMCIDHyperParams
from emcid_tpu.models.loader import build_tiny_pipeline
from emcid_tpu.models.pipeline import generate

SEEDS = (0, 1, 2)
GEN = dict(num_inference_steps=2, height=16, width=16)

HP = {
    "layers": [2, 3], "clamp_norm_factor": 1.5, "layer_selection": "all",
    "fact_token": "subject_last", "v_num_grad_steps": 8, "v_lr": 0.1,
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


@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog", "bird", "fish"])


@pytest.fixture(scope="module")
def scorer():
    return make_vit_scorer()


def _edit_request(seed):
    return {"prompts": ["a photo of {}", "{}"], "source": "cat",
            "dest": "dog", "seed_train": seed}


def _metrics(comps_edited, scorer, seed):
    """(efficacy, generalization, specificity) — the AICE triple on the
    tiny pipeline: source prompts scored under the dest class (efficacy),
    held-out prompt phrasing likewise (generalization), untouched-concept
    images under their own class (specificity)."""
    eval_req = {"prompts": ["a photo of {}", "{}"], "source": "cat",
                "dest": "dog", "source id": 1, "dest id": 2,
                "seeds": [seed, seed + 1]}
    train = generate_cal_cls_score(
        comps_edited, scorer, [eval_req], is_edited=True, gen_kwargs=GEN)
    val_req = dict(eval_req, prompts=["an image of a {}"],
                   seeds=[seed + 2])
    val = generate_cal_cls_score(
        comps_edited, scorer, [val_req], is_edited=True, gen_kwargs=GEN)
    spec_imgs = generate(comps_edited, ["a photo of bird"] * 2,
                         [seed + 3, seed + 4], **GEN)
    spec = calculate_single_cls_score(scorer, spec_imgs, 3)
    return np.array([train["source_dest_scores"][0],
                     val["source_dest_scores"][0],
                     float(spec)])


def _run_mode(comps, scorer, tmp_path, hp_over=None, **apply_over):
    hp = EMCIDHyperParams.from_dict(dict(HP, **(hp_over or {})))
    rows = []
    for seed in SEEDS:
        edited, _ = apply_emcid(
            comps, [_edit_request(seed)], hp,
            stats_dir=tmp_path / "stats", num_inference_steps=2,
            verbose=False, **apply_over)
        rows.append(_metrics(edited, scorer, seed))
    return np.stack(rows)  # (seeds, 3 metrics)


def _assert_within_noise(default, exact, label):
    """Mean paired per-seed metric delta must sit inside the exact mode's
    own across-seed noise band (3σ + an absolute floor for the tiny-prob
    regime of the random scorer)."""
    paired = default - exact  # (seeds, metrics)
    mean_delta = np.abs(paired.mean(axis=0))
    noise = 3.0 * exact.std(axis=0) + 1e-3
    for name, d, n in zip(("efficacy", "generalization", "specificity"),
                          mean_delta, noise):
        assert d <= n, (
            f"{label}: {name} delta {d:.5f} exceeds noise band {n:.5f} "
            f"(default={default.mean(axis=0)}, exact={exact.mean(axis=0)})")


@pytest.mark.slow
def test_eps_pool_metric_parity(comps, scorer, tmp_path):
    pool = _run_mode(comps, scorer, tmp_path / "p", eps_dest_pool=25)
    fresh = _run_mode(comps, scorer, tmp_path / "f", eps_dest_pool=0)
    _assert_within_noise(pool, fresh, "eps_pool=25 vs fresh")


@pytest.mark.slow
def test_train_sampler_metric_parity(comps, scorer, tmp_path):
    dpm = _run_mode(comps, scorer, tmp_path / "d", train_sampler="dpm++")
    pndm = _run_mode(comps, scorer, tmp_path / "n", train_sampler="pndm")
    _assert_within_noise(dpm, pndm, "dpm++-25 vs pndm-50")


@pytest.mark.slow
def test_cfg_interval_metric_parity(comps, scorer, tmp_path):
    """Deviation #4 (CFG-interval training images): dropping the uncond
    branch for the low-noise sampler tail must not move AICE metrics
    outside the full-interval protocol's own seed noise."""
    trunc = _run_mode(comps, scorer, tmp_path / "t", cfg_interval=0.6)
    full = _run_mode(comps, scorer, tmp_path / "u", cfg_interval=1.0)
    _assert_within_noise(trunc, full, "cfg_interval 0.6 vs 1.0")


@pytest.mark.slow
def test_train_res_metric_parity(comps, scorer, tmp_path):
    """Deviation #5 (training-resolution lever, OPT-IN): training images +
    Stage-1 at half the native resolution must keep AICE metrics inside
    the native protocol's own seed noise (the tiny 8-vs-16 ratio is MORE
    aggressive than the product candidate 384-vs-512)."""
    low = _run_mode(comps, scorer, tmp_path / "lr", train_res=8)
    nat = _run_mode(comps, scorer, tmp_path / "nr", train_res=16)
    _assert_within_noise(low, nat, "train_res 8 vs 16")


@pytest.mark.slow
def test_z_schedule_metric_parity(comps, scorer, tmp_path):
    """Deviation #3 (cosine fast z protocol): must match the const
    reference protocol's AICE metrics at a protocol-sized step count
    (>= 50, where the schedule engages)."""
    over = {"v_num_grad_steps": 50}
    cos = _run_mode(comps, scorer, tmp_path / "c", hp_over=over,
                    z_sched="cosine", eps_dest_pool=0)
    const = _run_mode(comps, scorer, tmp_path / "k", hp_over=over,
                      z_sched="const", eps_dest_pool=0)
    _assert_within_noise(cos, const, "cosine-30 vs const-50")
