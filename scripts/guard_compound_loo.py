"""Leave-one-out decomposition of the compound deviation stack
(round-5 follow-up to scripts/guard_bands.py: the all-5-on stack exceeds
the rng-null band on efficacy/generalization — which lever drives it?).

For each lever, runs the compound with THAT lever flipped to exact and
reports the delta vs the all-exact protocol; also probes K=50 (pool size
= step count) as a candidate softer eps_pool default.

    nohup python -u scripts/guard_compound_loo.py > /tmp/guard_loo.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ["JAX_PLATFORMS"] = "cpu"  # cache-dir keying; see guard_bands.py


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from emcid_tpu.evals import deviation_harness as dh
    from emcid_tpu.models.loader import build_tiny_pipeline

    comps = build_tiny_pipeline(seed=0,
                                words=["cat", "dog", "bird", "fish"])
    scorer = dh.make_guard_scorer()
    import tempfile

    tmp = Path(tempfile.mkdtemp(prefix="guard_loo_"))
    HO = dh.COMPOUND["hp_over"]
    D = dh.COMPOUND["default"]
    E = dh.COMPOUND["exact"]

    def mode(name, **kw):
        t0 = time.time()
        rows = dh.run_mode(comps, scorer, tmp / name, hp_over=HO, **kw)
        log(f"  mode {name}: {time.time() - t0:.0f}s "
            f"rows={np.round(rows, 4).tolist()}")
        return rows

    exact = mode("exact", **E)
    reps = [dh.run_mode(comps, scorer, tmp / f"null{r}", hp_over=HO,
                        rng_seed=r, **E) for r in dh.NULL_RNGS]
    band = dh.null_band(reps, exact)
    log(f"band = {np.round(band, 4).tolist()}")

    results = {"band": band.tolist()}

    def record(label, rows):
        rep = dh.paired_report(rows, exact, band)
        results[label] = dict(mean_delta=rep["mean_delta"].tolist(),
                              ok=rep["ok"].tolist(),
                              rows=rows.tolist())
        log(f"{label}: |Δ|={np.round(rep['mean_delta'], 4).tolist()} "
            f"ok={rep['ok'].tolist()}")

    record("compound", mode("compound", **D))
    for lever in ("train_sampler", "eps_dest_pool", "z_sched",
                  "cfg_interval", "train_res"):
        kw = dict(D)
        if lever == "train_sampler":
            kw["train_sampler"] = E["train_sampler"]
            kw.pop("train_steps", None)
        else:
            kw[lever] = E[lever]
        record(f"loo:{lever}", mode(f"loo_{lever}", **kw))
    # softer pool: K = step count (every step gets a distinct pool draw)
    record("alt:pool50", mode("pool50", **dict(D, eps_dest_pool=50)))

    out = Path("results/guard_compound_loo.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
