"""SDXL deviation guards (VERDICT r4 next #7a): the tiny-AICE
metric-guard harness cloned to the SDXL path so the cfg-interval /
train-res decisions at 1024² have PRE-REGISTERED acceptance rules before
the on-chip measurements arrive.

Scope (emcid_tpu/evals/deviation_harness.py SDXL section):
* cfg_interval 0.6 SHIPS for SDXL (sdxl_training_latents resolves the
  same product default as SD) — guarded here like the SD levers;
* train_res is GATED OFF for SDXL (resolve_train_res lowers nothing
  unless native==512) — test_train_res_gated_off pins the gate, and
  test_train_res_rule_preregistered runs the acceptance rule a future
  flip must pass (informational: records the verdict, doesn't gate);
* a z*0.5 negative control must FAIL the band, proving the SDXL harness
  can reject anything at all (the SD harness lesson, PERF.md round 5).
"""

import numpy as np
import pytest

from emcid_tpu.evals import deviation_harness as dh
from emcid_tpu.models.sdxl import build_tiny_sdxl_pipeline

pytestmark = pytest.mark.slow

# 2 seeds (vs the SD harness's 3): the probed SDXL regime separates the
# z*0.5 control from the rng-null by 5x (deviation_harness.SDXL_TINY_HP
# note), so the wider 2-seed SE band still discriminates — and the file
# stays inside a slow-tier budget (~8 min single-core)
SEEDS = (0, 1)


@pytest.fixture(scope="module")
def comps():
    return build_tiny_sdxl_pipeline(words=["cat", "dog", "bird", "fish"])


@pytest.fixture(scope="module")
def scorer():
    return dh.make_guard_scorer()


@pytest.fixture(scope="module")
def covs(comps):
    return dh.make_sdxl_covs(comps)


@pytest.fixture(scope="module")
def null(comps, scorer, covs):
    """Exact-protocol base + rng replicas → (base_rows, band)."""
    exact = dict(cfg_interval=1.0, train_res=None)
    base = dh.sdxl_run_mode(comps, scorer, seeds=SEEDS, covs=covs, **exact)
    reps = [dh.sdxl_run_mode(comps, scorer, seeds=SEEDS, covs=covs, rng_seed=r, **exact)
            for r in dh.NULL_RNGS[:2]]
    return base, dh.null_band(reps, base)


def test_train_res_gated_off(comps):
    """The product applies train_res only at native 512 — the tiny SDXL
    native (16) must resolve to no reduction (engine/editor.py)."""
    from emcid_tpu.engine.editor import resolve_train_res

    native = comps.unet.config.sample_size * comps.vae_scale
    assert native != 512
    assert resolve_train_res(comps) == native


def test_sdxl_cfg_interval_guard(comps, scorer, covs, null):
    """The SHIPPING SDXL lever: cfg 0.6 must sit inside the exact
    protocol's own rng-null band."""
    base, band = null
    d = dh.sdxl_run_mode(comps, scorer, seeds=SEEDS, covs=covs, cfg_interval=0.6)
    dh.assert_within_noise(d, base, band, "sdxl cfg_interval 0.6 vs 1.0")


def test_sdxl_negative_control_z_half(comps, scorer, covs, null):
    """Non-vacuity: a z*0.5 corruption must BREAK the band."""
    base, band = null
    b = dh.sdxl_run_mode(comps, scorer, seeds=SEEDS, covs=covs, cfg_interval=1.0,
                         z_transform=lambda z: 0.5 * z)
    dh.assert_outside_noise(b, base, band, "sdxl z*0.5 control")


def test_train_res_rule_preregistered(comps, scorer, covs, null, capsys):
    """The acceptance rule a future SDXL train-res flip must pass, run
    at the product 0.75x ratio.  Informational: the verdict is recorded
    (printed + structurally asserted), NOT enforced — the lever does not
    ship for SDXL (test_train_res_gated_off pins that)."""
    base, band = null
    d = dh.sdxl_run_mode(comps, scorer, seeds=SEEDS, covs=covs, cfg_interval=1.0,
                         train_res=dh.SDXL_LEVERS["train_res"]["default"]
                         ["train_res"])
    # the exact side (cfg 1.0, native res) IS the null base — reuse it
    rep = dh.paired_report(d, base, band)
    assert rep["mean_delta"].shape == (3,)
    verdict = "KEEP" if rep["ok"].all() else "RESTORE"
    print(f"sdxl train_res 12-vs-16 pre-registered rule: {verdict} "
          f"(deltas {np.round(rep['mean_delta'], 4).tolist()}, "
          f"band {np.round(rep['band'], 4).tolist()})")
