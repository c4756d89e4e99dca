#!/usr/bin/env bash
# Round-4 chip-job queue (v2): serializes the remaining single-chip jobs in
# verdict-priority order with a global deadline so the chip is free for the
# driver's bench run at round end. Each stage is resumable, bounded, and
# skipped outright if its start would pass the deadline.
#
#   bash scripts/round4_chip_queue.sh <deadline_epoch> >> /tmp/chip_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?usage: round4_chip_queue.sh <deadline_epoch>}"
SWEEP_DIR=runs/hns10m
OLD_GAMES=30   # catalog size the in-flight sweep was launched with

left() { echo $((DEADLINE - $(date +%s))); }
stage() {  # stage <name> <min_seconds_needed> <cap_seconds> <cmd...>
  local name="$1" need="$2" cap="$3"
  shift 3
  if [ "$(left)" -lt "$need" ]; then
    echo "[queue] SKIP $name (only $(left)s left, needs ${need}s)"
    return 0
  fi
  local budget=$(( $(left) < cap ? $(left) : cap ))
  echo "[queue] stage: $name (budget ${budget}s, $(left)s to deadline)"
  timeout "$budget" "$@" || true
}

echo "[queue] waiting for the seed-1 sweep over the original $OLD_GAMES games"
while true; do
  n=$(ls -a "$SWEEP_DIR" 2>/dev/null | grep -c "^\.done_.*_s1$" || true)
  if [ "$n" -ge "$OLD_GAMES" ] || [ "$(left)" -lt 9000 ]; then break; fi
  sleep 60
done
echo "[queue] stopping the running sweep cleanly"
touch "$SWEEP_DIR/.stop"
while pgrep -f "train_impala_anakin.*$SWEEP_DIR" > /dev/null 2>&1; do sleep 20; done
sleep 5
rm -f "$SWEEP_DIR/.stop"

SEEDS=1 stage "new-games seed-1 sweep (first slice)" 1800 3600 \
  bash scripts/run_hns_sweep.sh 10000000 "$SWEEP_DIR"

stage "pipeline perf sweep" 1200 1800 \
  python scripts/perf_sweep.py --pipeline --skip-async --skip-sebulba \
  --out static/perf_sweep_r4.jsonl

stage "procgen training" 1200 1500 \
  bash scripts/run_procgen_train.sh 8000000 runs/procgen_train

stage "sebulba curve chunk" 1000 1200 \
  bash scripts/run_sebulba_curve.sh 50000000 runs/sebulba50

stage "seed-variance (seed 2)" 1200 1500 \
  python -m cleanba_tpu.benchmark --env-ids Breakout-v5 --num-seeds 1 \
  --start-seed 2 --timeout-minutes 45 --retries 1 --no-auto-tag \
  --command "python -m cleanba_tpu.train_impala_anakin --env-id Breakout-v5 \
    --local-num-envs 128 --num-steps 20 --bf16 --total-timesteps 50000000 \
    --log-frequency 50 --run-dir runs/seed_variance --run-name var_breakout_s{seed}"

stage "seed-variance (seed 3)" 1200 1500 \
  python -m cleanba_tpu.benchmark --env-ids Breakout-v5 --num-seeds 1 \
  --start-seed 3 --timeout-minutes 45 --retries 1 --no-auto-tag \
  --command "python -m cleanba_tpu.train_impala_anakin --env-id Breakout-v5 \
    --local-num-envs 128 --num-steps 20 --bf16 --total-timesteps 50000000 \
    --log-frequency 50 --run-dir runs/seed_variance --run-name var_breakout_s{seed}"

SEEDS=2 stage "seed-1 fill + seed-2 sweep" 600 99999 \
  bash scripts/run_hns_sweep.sh 10000000 "$SWEEP_DIR"

echo "[queue] done ($(left)s before deadline)"
