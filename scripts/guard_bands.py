"""Measure the deviation-guard noise bands and per-lever metric deltas
(VERDICT r4 next #1b): runs the null replicas (reference-exact protocol
at different Stage-1 eps rng_seeds — the intra-protocol MC noise that
defines the acceptance band), every lever pair, both negative controls,
and the compound all-5-on vs all-off stack through the shared tiny-AICE
harness (emcid_tpu/evals/deviation_harness.py), prints a table, and
persists results/guard_bands.json (incl. raw per-seed metric rows, so
band constants can be re-tuned post hoc without re-running).

CPU-only (tiny pipeline); ~30-60 min on the 1-core host.

    nohup python -u scripts/guard_bands.py > /tmp/guard_bands.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
# cache-dir keying (emcid_tpu.runtime) reads this env var at import; the
# in-process jax.config.update below is invisible to it — without this,
# host-ISA-specific CPU executables land in the shared backend dir and can
# segfault other hosts' sessions (round-5 incident)
os.environ["JAX_PLATFORMS"] = "cpu"

# the full reference-exact protocol on the tiny harness (all five levers
# off); the null replicas re-run THIS at rng_seed 1, 2
EXACT_ALL = dict(train_sampler="pndm", eps_dest_pool=0, z_sched="const",
                 cfg_interval=1.0, train_res=16)


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

    tmp = Path(tempfile.mkdtemp(prefix="guard_bands_"))

    memo = {}

    def mode(name, hp_over=None, z_transform=None, rng_seed=0,
             **apply_over):
        key = (json.dumps(hp_over, sort_keys=True),
               json.dumps({k: v for k, v in sorted(apply_over.items())},
                          default=str),
               getattr(z_transform, "__name__", None) if z_transform
               else None, rng_seed)
        if key not in memo:
            t0 = time.time()
            memo[key] = dh.run_mode(
                comps, scorer, tmp / name, hp_over=hp_over,
                z_transform=z_transform, rng_seed=rng_seed, **apply_over)
            log(f"  mode {name}: {time.time() - t0:.0f}s "
                f"rows={np.round(memo[key], 4).tolist()}")
        return memo[key]

    # --- null families: reference-exact protocol, rng replicas ---------
    nulls = {}
    bands = {}
    for fam, hp_over in (("g8", None), ("g50", {"v_num_grad_steps": 50})):
        log(f"— null family {fam} (exact protocol, rng replicas)")
        base = mode(f"null_{fam}_r0", hp_over=hp_over, rng_seed=0,
                    **EXACT_ALL)
        reps = [mode(f"null_{fam}_r{r}", hp_over=hp_over, rng_seed=r,
                     **EXACT_ALL) for r in dh.NULL_RNGS]
        bands[fam] = dh.null_band(reps, base)
        nulls[fam] = dict(base=base.tolist(),
                          replicas=[r.tolist() for r in reps],
                          band=bands[fam].tolist())
        log(f"  band[{fam}] = {np.round(bands[fam], 4).tolist()}")

    results = {}

    def record(label, d_rows, e_rows, band):
        rep = dh.paired_report(d_rows, e_rows, band)
        results[label] = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in rep.items()
        }
        log(f"{label}: |Δ|={np.round(rep['mean_delta'], 4).tolist()} "
            f"band={np.round(rep['band'], 4).tolist()} "
            f"ok={rep['ok'].tolist()}")

    for lever, spec in dh.LEVERS.items():
        log(f"— lever {lever}")
        d = mode(f"{lever}_d", hp_over=spec.get("hp_over"),
                 **spec["default"])
        e = mode(f"{lever}_e", hp_over=spec.get("hp_over"),
                 **spec["exact"])
        fam = "g50" if (spec.get("hp_over") or {}).get(
            "v_num_grad_steps") == 50 else "g8"
        record(f"lever:{lever}", d, e, bands[fam])

    log("— compound all-5-on vs all-off")
    d = mode("compound_d", hp_over=dh.COMPOUND["hp_over"],
             **dh.COMPOUND["default"])
    e = mode("compound_e", hp_over=dh.COMPOUND["hp_over"],
             **dh.COMPOUND["exact"])
    record("compound", d, e, bands["g50"])

    for ctrl, spec in dh.CONTROLS.items():
        log(f"— negative control {ctrl}")
        b_kwargs = dict(spec["broken"])
        b = mode(f"{ctrl}_b", hp_over=b_kwargs.pop("hp_over", None),
                 **b_kwargs)
        e_kwargs = dict(spec["exact"])
        e = mode(f"{ctrl}_e", hp_over=e_kwargs.pop("hp_over", None),
                 **e_kwargs)
        fam = "g50" if (spec["exact"].get("hp_over") or {}).get(
            "v_num_grad_steps") == 50 else "g8"
        record(f"control:{ctrl}", b, e, bands[fam])

    out = Path("results/guard_bands.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        dict(null_sigmas=dh.NULL_SIGMAS, abs_floor=dh.ABS_FLOOR,
             seeds=list(dh.SEEDS), n_steps=dh.N_STEPS,
             null_rngs=list(dh.NULL_RNGS), nulls=nulls,
             results=results), indent=1))
    log(f"wrote {out}")

    bad = [k for k, v in results.items()
           if k.startswith(("lever", "compound")) and not all(v["ok"])]
    vacuous = [k for k, v in results.items()
               if k.startswith("control") and all(v["ok"])]
    log(f"levers/compound failing (want none): {bad}")
    log(f"controls passing i.e. vacuous band (want none): {vacuous}")


if __name__ == "__main__":
    main()
