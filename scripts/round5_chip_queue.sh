#!/usr/bin/env bash
# Round-5 chip queue: runs the verdict-r4 evidence stages in priority order
# on the single tunneled TPU chip, with stage caps so a long stage can never
# starve the rest and an inter-stage drain so a timeout-orphaned trainer can
# never collide with the next stage. Every stage is marker-resumable, so the
# queue can be re-invoked each chip window.
#
#   bash scripts/round5_chip_queue.sh <deadline_epoch>
#
# Stage order (verdict r4 "next" items):
#   1. calibration re-runs  — re-train the four re-calibrated games @10M
#   2. seed-2 pass          — the original 11 games @10M (3-seed protocol)
#   3. 50M re-runs          — the four low-HNS outliers at reference budget
#   4. sebulba curve chunk  — continue the 50M Sebulba run from checkpoint
#   5. procgen              — finish Chaser, broaden the trained set
#   6. leftover             — full seed-2 sweep fill over the catalog
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?usage: round5_chip_queue.sh <deadline_epoch>}"

RECAL_GAMES="Kangaroo-v5 Jamesbond-v5 Zaxxon-v5 Freeway-v5"
SEED2_GAMES="Breakout-v5 Pong-v5 SpaceInvaders-v5 BeamRider-v5 Boxing-v5 Seaquest-v5 Qbert-v5 Asterix-v5 MsPacman-v5 DemonAttack-v5 Enduro-v5"
LONG_GAMES="Seaquest-v5 Amidar-v5 Frostbite-v5 Riverraid-v5"

left() { echo $((DEADLINE - $(date +%s))); }
drain() {
  while pgrep -f "cleanba_tpu" > /dev/null 2>&1 || \
        pgrep -f "perf_sweep.py" > /dev/null 2>&1 || \
        pgrep -f "run_hns_sweep" > /dev/null 2>&1; do
    sleep 15
  done
  sleep 5
}
stage() {  # stage <name> <min_needed> <cap> <cmd...>
  local name="$1" need="$2" cap="$3"
  shift 3
  drain
  if [ "$(left)" -lt "$need" ]; then
    echo "[queue5] SKIP $name (only $(left)s left, needs ${need}s)"
    return 0
  fi
  local budget=$(( $(left) < cap ? $(left) : cap ))
  echo "[queue5] stage: $name (budget ${budget}s, $(left)s to deadline)"
  timeout "$budget" "$@" || true
}

echo "[queue5] waiting for any in-flight chip job to wind down"
drain

# 1. Re-train the re-calibrated games. Stale pre-calibration runs/markers
#    are cleared once (guarded by a marker so a re-invoked queue does not
#    wipe the fresh re-runs).
if [ ! -e runs/hns10m/.recal_r5_cleared ]; then
  for G in $RECAL_GAMES; do
    rm -rf "runs/hns10m/hns_${G}_s1" "runs/hns10m/.done_${G}_s1" \
           "runs/hns10m/hns_${G}_s2" "runs/hns10m/.done_${G}_s2"
  done
  touch runs/hns10m/.recal_r5_cleared
fi
GAMES_OVERRIDE="$RECAL_GAMES" SEEDS=1 stage "recalibration re-runs" 900 3600 \
  bash scripts/run_hns_sweep.sh 10000000 runs/hns10m

# 2. Seed-2 on the original 11 (seed-1 entries all have done markers, so the
#    forced leading seed-1 pass is free).
GAMES_OVERRIDE="$SEED2_GAMES" SEEDS=2 stage "seed-2 pass (original 11)" 900 5400 \
  bash scripts/run_hns_sweep.sh 10000000 runs/hns10m

# 3. 50M re-runs of the low-HNS outliers in their own dir (hns_aggregate
#    merges globs, longest run wins). Full frameskip fusion: the per-run
#    compile is amortized over 50M steps.
CLEANBA_FRAMESKIP_UNROLL=0 TIMEOUT_MIN=45 GAMES_OVERRIDE="$LONG_GAMES" SEEDS=1 \
  stage "50M outlier re-runs" 1500 7200 \
  bash scripts/run_hns_sweep.sh 50000000 runs/hns50m

# 4. Pipelined sync-PPO sweep (verdict r4 #9): 4 configs incl. the sync
#    baseline re-measured in-session.
stage "ppo pipeline sweep" 900 1500 \
  python scripts/perf_sweep.py --ppo-pipeline --skip-async --skip-sebulba \
  --skip-anakin --out static/perf_sweep_r5.jsonl

# 5. Continue the Sebulba 50M curve from its latest checkpoint (the point is
#    a real multi-chunk resumed curve, verdict r4 #4; at ~2k SPS a 3600s
#    chunk adds ~7M steps, taking the curve past 10M total).
stage "sebulba curve chunk" 1200 3600 \
  bash scripts/run_sebulba_curve.sh 50000000 runs/sebulba50

# 6. Procgen: finish Chaser at full budget with a saved model, then broaden.
#    One-time fixups: Starpilot finished at budget in r4 but never got its
#    marker; Chaser's r4 run was timeout-capped with no checkpoint, so it
#    restarts clean (the old curve stays in git history).
if [ ! -e runs/procgen_train/.r5_fixups ]; then
  touch runs/procgen_train/.done_Starpilot-v0
  rm -rf runs/procgen_train/pg_Chaser-v0_s1
  touch runs/procgen_train/.r5_fixups
fi
stage "procgen training" 1200 7200 \
  bash scripts/run_procgen_train.sh 8000000 runs/procgen_train

# 7. Whatever time is left: fill the full seed-2 sweep.
SEEDS=2 stage "full seed-2 fill" 600 99999 \
  bash scripts/run_hns_sweep.sh 10000000 runs/hns10m

echo "[queue5] done ($(left)s before deadline)"
