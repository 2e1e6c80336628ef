"""bench.py harness smoke: the driver-run benchmark must never crash on the
real chip because of a harness bug, so the identical code path (gen →
Stage-1 → Stage-2, best-of-N timed passes, JSON contract) runs here on the
tiny pipeline via ``BENCH_TINY=1``.

Contract (driver requirement): bench.py prints EXACTLY ONE stdout line and
it is JSON with keys metric/value/unit/vs_baseline."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_end_to_end():
    env = dict(os.environ)
    env.update({
        "BENCH_TINY": "1",
        "BENCH_CONCEPTS": "2",
        "BENCH_GRAD_STEPS": "2",
        "BENCH_GEN_STEPS": "2",
        "BENCH_EPS_POOL": "2",
        "BENCH_REPEATS": "2",  # exercises the best-of-N loop
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench.py must print ONE line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "concepts/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # both timed passes ran (best-of-2)
    assert "pass 2/2" in out.stderr
