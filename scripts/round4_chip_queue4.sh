#!/usr/bin/env bash
# Round-4 chip queue v4: resumes after the in-flight stage-1 sweep, with an
# inter-stage chip drain so a timeout-orphaned trainer can never collide
# with the next stage.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?usage: round4_chip_queue4.sh <deadline_epoch>}"
SWEEP_DIR=runs/hns10m

left() { echo $((DEADLINE - $(date +%s))); }
drain() {
  # Wait for ANY framework process that may hold the chip to exit (pgrep is
  # used for waiting only — never for killing).
  while pgrep -f "cleanba_tpu" > /dev/null 2>&1 || \
        pgrep -f "perf_sweep.py" > /dev/null 2>&1; do
    sleep 15
  done
  sleep 5
}
stage() {  # stage <name> <min_needed> <cap> <cmd...>
  local name="$1" need="$2" cap="$3"
  shift 3
  drain
  if [ "$(left)" -lt "$need" ]; then
    echo "[queue4] SKIP $name (only $(left)s left, needs ${need}s)"
    return 0
  fi
  local budget=$(( $(left) < cap ? $(left) : cap ))
  echo "[queue4] stage: $name (budget ${budget}s, $(left)s to deadline)"
  timeout "$budget" "$@" || true
}

echo "[queue4] waiting for the orphaned stage-1 sweep to wind down"
drain

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

echo "[queue4] done ($(left)s before deadline)"
