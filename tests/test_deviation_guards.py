"""Deviation-guard harness: live mechanics tests (VERDICT r4 next #1).

The FULL measurement — 5 levers + compound + 2 negative controls + null
families, ~25 min — lives in ``scripts/guard_bands.py`` and persists
``results/guard_bands.json`` (committed; pinned by
tests/test_guard_bands_record.py).  This file proves the harness still
works IN-TREE on every suite run without re-paying the sweep:

* a cheap live lever guard (cfg_interval) must PASS its rng-null band;
* a live negative control (z*0.5 after Stage-1) must FAIL the band —
  the non-vacuity proof the round-4 harness lacked;
* unit tests for the statistic (null_band SE scaling, paired_report,
  the assert helpers' failure modes) on synthetic rows.
"""

import numpy as np
import pytest

from emcid_tpu.evals import deviation_harness as dh
from emcid_tpu.models.loader import build_tiny_pipeline


# ---------------------------------------------------------------------------
# statistic unit tests (fast)
# ---------------------------------------------------------------------------

def test_null_band_se_scaling():
    exact = np.zeros((4, 3))
    reps = [np.full((4, 3), 0.1), np.full((4, 3), -0.1)]
    band = dh.null_band(reps, exact)
    # rms = 0.1, SE over 4 seeds = 0.05, x NULL_SIGMAS + floor
    np.testing.assert_allclose(
        band, dh.NULL_SIGMAS * 0.1 / 2.0 + dh.ABS_FLOOR, atol=1e-12)


def test_paired_report_verdicts():
    exact = np.zeros((3, 3))
    band = np.full(3, 0.05)
    ok = dh.paired_report(exact + 0.01, exact, band)
    assert ok["ok"].all()
    bad = dh.paired_report(exact + np.array([0.2, 0.0, 0.0]), exact, band)
    assert not bad["ok"][0] and bad["ok"][1]


def test_assert_helpers_raise():
    exact = np.zeros((3, 3))
    band = np.full(3, 0.05)
    with pytest.raises(AssertionError, match="exceeds the null band"):
        dh.assert_within_noise(exact + 0.2, exact, band, "x")
    with pytest.raises(AssertionError, match="vacuous"):
        dh.assert_outside_noise(exact + 0.01, exact, band, "x")
    # and the happy paths
    dh.assert_within_noise(exact + 0.01, exact, band, "x")
    dh.assert_outside_noise(exact + 0.2, exact, band, "x")


def test_guard_scorer_is_low_class_count():
    """The guard scorer must NOT be the 1000-class product head — that
    configuration was measured vacuous (softmax moves ~1e-6/image)."""
    s = dh.make_guard_scorer()
    assert s.model.config.num_labels == 4


# ---------------------------------------------------------------------------
# live harness (slow): one passing lever + one failing control against a
# freshly computed rng-null — the in-tree non-vacuity proof
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def comps():
    return build_tiny_pipeline(seed=0, words=["cat", "dog", "bird", "fish"])


@pytest.fixture(scope="module")
def scorer():
    return dh.make_guard_scorer()


EXACT_ALL = dict(train_sampler="pndm", eps_dest_pool=0, z_sched="const",
                 cfg_interval=1.0, train_res=16)


@pytest.fixture(scope="module")
def null(comps, scorer, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("guards")
    base = dh.run_mode(comps, scorer, tmp / "e", **EXACT_ALL)
    reps = [dh.run_mode(comps, scorer, tmp / "e", rng_seed=r, **EXACT_ALL)
            for r in dh.NULL_RNGS[:2]]
    return tmp, base, dh.null_band(reps, base)


@pytest.mark.slow
def test_cfg_interval_lever_live(comps, scorer, null):
    tmp, base, band = null
    d = dh.run_mode(comps, scorer, tmp / "d",
                    **dict(EXACT_ALL, cfg_interval=0.6))
    dh.assert_within_noise(d, base, band, "cfg_interval 0.6 vs 1.0")


@pytest.mark.slow
def test_negative_control_z_half_live(comps, scorer, null):
    tmp, base, band = null
    b = dh.run_mode(comps, scorer, tmp / "b",
                    z_transform=lambda z: 0.5 * z, **EXACT_ALL)
    dh.assert_outside_noise(b, base, band, "z*0.5 control")
