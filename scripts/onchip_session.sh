#!/bin/bash
# Serialized on-chip probe session (axon tunnel rules: ONE TPU client at a
# time, never killed mid-execution).  Run with:
#   nohup bash scripts/onchip_session.sh > /tmp/onchip.log 2>&1 &
#   echo $! > /tmp/onchip.pid
# Steps ordered by value: the headline bench first (worker may degrade
# later in the session), then the measurements that decide default flips.
# Skip steps with ONCHIP_SKIP="gn cfg" etc.
set -uo pipefail
cd /root/repo
SKIP="${ONCHIP_SKIP:-}"

# Timeout semantics on the axon tunnel: SIGTERM during an RPC is IGNORED
# by the client (CLAUDE.md TPU rules), so `timeout` can only ever stop a
# step BETWEEN RPCs — a graceful client exit, not the forbidden
# mid-execution kill.  Never add --kill-after (SIGKILL degrades the
# remote worker ~30 min).  Budgets are generous: a degraded worker runs
# 2.5-4x slower (PERF.md round-4 ops notes) and every fresh process pays
# remote compiles, so a tight budget would kill healthy long probes.
step() {
  local name="$1"; shift
  local budget="$1"; shift
  case " $SKIP " in *" $name "*) echo "== $name SKIPPED"; return;; esac
  echo "== $name start $(date +%H:%M:%S) (budget ${budget}s)"
  timeout "$budget" "$@" 2>&1 | tail -c 200000
  echo "== $name done $(date +%H:%M:%S) (rc=$?)"
}

# 1. headline bench on current product defaults
step bench 7200 python -u bench.py

# 2. fused-GN A/B (decides EMCID_TPU_FUSED_GN default): bare ops first,
#    then UNet fwd / fwd+ctx-grad
step gn 9000 python -u scripts/prof_gn.py

# 3. CFG-interval z-agreement (decides EMCID_TPU_CFG_INTERVAL default)
step cfg 10800 python -u scripts/prof_cfg_interval.py

# 3b. training-resolution z-agreement (decides EMCID_TPU_TRAIN_RES default;
#     the largest single lever: 384 ≈ 0.56x gen+Stage-1 FLOPs)
step trainres 10800 python -u scripts/prof_trainres.py

# 4. level-0 remat C-sweep (C=12/16 fit?  gen OOM is solved separately by
#    EMCID_TPU_GEN_BATCH, so stage-1 fit is the only open question)
step remat 9000 python -u scripts/prof_remat.py 8,12,16 none,level0

# 5. SDXL stage-1 / x-kv timings (generation skipped: compiler 500'd at
#    1024^2 last session)
step sdxl 9000 env SDXL_PROF_SKIP_GEN=1 python -u scripts/prof_sdxl.py

# 6. component backward probes (lever (a)): lowest priority — ~4 remote
#    compiles per probe; run only if the worker is still healthy by now
step bwd 7200 python -u scripts/prof_bwd.py

echo "== session complete $(date +%H:%M:%S)"
