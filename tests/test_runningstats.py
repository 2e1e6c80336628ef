"""Streaming stats: numerical correctness vs numpy, npz cache round-trip,
and byte-level schema compatibility with the reference's state format
(reference util/runningstats.py:469-511, 1409-1512)."""

import numpy as np
import pytest

from emcid_tpu.stats import (
    CombinedStat,
    Covariance,
    FixedRandomSubsetSampler,
    Mean,
    NormMean,
    SecondMoment,
    Variance,
    box_numpy_null,
    cache_load_enabled,
    tally,
    unbox_numpy_null,
)


def _feed(stat, data, batches=7):
    for chunk in np.array_split(data, batches):
        stat.add(chunk)
    return stat


def test_mean_matches_numpy(rng):
    data = rng.randn(1000, 16).astype(np.float32)
    m = _feed(Mean(), data)
    np.testing.assert_allclose(np.asarray(m.mean()), data.mean(0), atol=1e-5)
    assert m.size() == 1000


def test_norm_mean(rng):
    data = rng.randn(500, 8).astype(np.float32)
    m = _feed(NormMean(), data)
    expected = np.linalg.norm(data, axis=-1).mean()
    np.testing.assert_allclose(np.asarray(m.mean()), expected, rtol=1e-5)


def test_variance_matches_numpy(rng):
    data = rng.randn(999, 12).astype(np.float64)
    v = _feed(Variance(), data, batches=13)
    np.testing.assert_allclose(np.asarray(v.mean()), data.mean(0), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(v.variance()), data.var(0, ddof=1), rtol=1e-6
    )


def test_covariance_matches_numpy(rng):
    data = rng.randn(400, 6).astype(np.float64)
    c = _feed(Covariance(), data, batches=5)
    # jax runs f32 by default (x64 disabled), so compare at f32 precision
    np.testing.assert_allclose(
        np.asarray(c.covariance()), np.cov(data.T), rtol=1e-4, atol=1e-6
    )


def test_second_moment_matches_numpy(rng):
    data = rng.randn(300, 32).astype(np.float32)
    s = _feed(SecondMoment(), data, batches=4)
    expected = data.T @ data / len(data)
    np.testing.assert_allclose(np.asarray(s.moment()), expected, atol=2e-4)
    assert s.count == 300


def test_second_moment_3d_input(rng):
    # Token-major inputs (batch, hidden) arrive pre-flattened in the stats
    # sweep; but 1-D input must also be handled (promoted to (N, 1)).
    s = SecondMoment()
    s.add(np.ones((10,), dtype=np.float32))
    assert np.asarray(s.mom2).shape == (1, 1)


def test_state_dict_schema_matches_reference(rng):
    data = rng.randn(64, 8).astype(np.float32)
    s = _feed(SecondMoment(), data, batches=2)
    sd = s.state_dict()
    assert set(sd) == {"constructor", "count", "mom2"}
    assert sd["constructor"] == "util.runningstats.SecondMoment()"
    m = _feed(Mean(), data, batches=2)
    assert set(m.state_dict()) == {
        "constructor", "count", "data_shape", "batchcount", "mean",
    }


def test_combined_stat_npz_roundtrip(tmp_path, rng):
    data = rng.randn(128, 8).astype(np.float32)
    cs = CombinedStat(mom2=SecondMoment(), mean=Mean(), norm_mean=NormMean())
    cache = tmp_path / "stats" / "layer0_float32_mom2.npz"
    for batch in tally(cs, list(data), cache=str(cache), batch_size=16,
                       sample_size=128, quiet=True):
        cs.add(batch)
    assert cache.exists()

    # Reload via tally cache path: loader must be empty, stat filled.
    cs2 = CombinedStat(mom2=SecondMoment(), mean=Mean(), norm_mean=NormMean())
    loader = tally(cs2, list(data), cache=str(cache), batch_size=16,
                   sample_size=128, quiet=True)
    assert list(loader) == []
    np.testing.assert_allclose(
        np.asarray(cs2.mom2.moment()), np.asarray(cs.mom2.moment()), rtol=1e-6
    )
    # npz keys are prefix-dotted as the reference writes them
    raw = np.load(cache)
    assert "mom2.mom2" in raw and "mom2.count" in raw and "mean.mean" in raw
    assert "sample_size" in raw


def test_cache_arg_mismatch_forces_recompute(tmp_path, rng):
    data = rng.randn(64, 4).astype(np.float32)
    cache = str(tmp_path / "c.npz")
    s = SecondMoment()
    for b in tally(s, list(data), cache=cache, batch_size=8, sample_size=64,
                   quiet=True):
        s.add(b)
    # different sample_size → cache miss
    s2 = SecondMoment()
    loader = tally(s2, list(data), cache=cache, batch_size=8, sample_size=32,
                   quiet=True)
    assert len(list(loader)) > 0

    # cache_load_enabled(False) → forced recompute even with matching args
    s3 = SecondMoment()
    with cache_load_enabled(False):
        loader = tally(s3, list(data), cache=cache, batch_size=8,
                       sample_size=64, quiet=True)
        assert len(list(loader)) > 0


def test_nan_boxed_null():
    d = {"a": None, "b": 3, "c": {"d": None}}
    boxed = box_numpy_null(d)
    assert not any(v is None for v in boxed.values())
    restored = unbox_numpy_null(boxed)
    assert restored["a"] is None and restored["c"]["d"] is None and restored["b"] == 3


def test_fixed_random_subset_sampler_deterministic():
    s1 = FixedRandomSubsetSampler(1000, 100, seed=1)
    s2 = FixedRandomSubsetSampler(1000, 100, seed=1)
    assert list(s1) == list(s2)
    assert len(s1) == 100
    s3 = FixedRandomSubsetSampler(1000, 100, seed=2)
    assert list(s1) != list(s3)


def test_reference_cache_interop(tmp_path, rng):
    """A state npz written with torch-free keys loads into SecondMoment,
    simulating a reference-produced cache (same keys/layout)."""
    mom2 = rng.randn(8, 8).astype(np.float32)
    path = tmp_path / "ref.npz"
    np.savez(
        path,
        **{
            "mom2.constructor": "util.runningstats.SecondMoment()",
            "mom2.count": 12345,
            "mom2.mom2": mom2,
            "sample_size": 12345,
        },
    )
    cs = CombinedStat(mom2=SecondMoment())
    loader = tally(cs, [], cache=str(path), sample_size=12345, quiet=True)
    assert list(loader) == []
    assert cs.mom2.count == 12345
    np.testing.assert_array_equal(np.asarray(cs.mom2.mom2), mom2)


def test_iou_stat():
    """IoU (reference runningstats.py:675-720): streaming == one-shot, and
    the npz state roundtrips."""
    from emcid_tpu.stats import IoU

    rng = np.random.RandomState(0)
    a = (rng.rand(40, 6) > 0.5).astype(np.float32)
    s = IoU()
    s.add(a[:25])
    s.add(a[25:])
    inter = a.T @ a
    union = np.diagonal(inter)[:, None] + np.diagonal(inter)[None, :] - inter
    np.testing.assert_allclose(s.intersection(), inter, rtol=1e-6)
    np.testing.assert_allclose(s.iou(), inter / (union + 1e-20), rtol=1e-6)
    assert s.size() == 40
    s2 = IoU(state=s.state_dict())
    np.testing.assert_allclose(s2.iou(), s.iou())
