"""Multi-process (DCN-axis) coverage (VERDICT r3 weak #6): two real
processes under ``jax.distributed.initialize`` on the CPU backend build the
hierarchical ("dcn", "data") mesh via the PRODUCT ``default_mesh`` and run
the covariance sweep + an eval psum whose collectives cross the process
boundary.  Single-process tests cover the ICI axis; this covers the claim
in parallel/mesh.py that the same engine entry points span slices."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_mesh(tmp_path):
    import os

    port = _free_port()
    worker = Path(__file__).parent / "multiprocess_worker.py"
    repo = Path(__file__).parent.parent
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}{os.pathsep}" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port),
             str(tmp_path / f"out{i}.json")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        assert p.returncode == 0, stdout[-3000:]
        outs.append(stdout)
    results = [json.loads((tmp_path / f"out{i}.json").read_text())
               for i in range(2)]
    for r in results:
        assert r["mesh_axes"] == ["dcn", "data"]
        # sharded covariance == local covariance (all-reduce correct)
        assert r["mom2_max_err"] < 1e-4, r
        assert r["mom2_count"] == r["local_count"]
        # psum-style eval mean over the 2-process mesh
        np.testing.assert_allclose(r["psum_mean"],
                                   np.arange(16).mean(), rtol=1e-6)
    # both processes agree on the replicated results
    assert results[0]["psum_mean"] == results[1]["psum_mean"]
