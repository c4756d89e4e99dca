#!/usr/bin/env bash
# Seed-variance evidence (VERDICT r3 "next" #7): Breakout Anakin IMPALA at
# 50M steps for seeds 2 and 3, to overlay against the existing seed-1 curve
# (static/curves/impala_breakout_50M.tfevents) — the reference's
# reproducibility-as-test methodology (README.md:20-22).
#
#   bash scripts/run_seed_variance.sh 50000000 runs/seed_variance
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-50000000}"
RUN_DIR="${2:-runs/seed_variance}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-600}"
mkdir -p "$RUN_DIR"

CMD="python -m cleanba_tpu.train_impala_anakin \
  --env-id Breakout-v5 --local-num-envs 128 --num-steps 20 --bf16 \
  --total-timesteps $STEPS --log-frequency 50 \
  --run-dir $RUN_DIR --run-name var_breakout_s{seed}"

for SEED in 2 3; do
  if [ -e "$RUN_DIR/.stop" ]; then
    echo "stop requested; exiting cleanly"
    exit 0
  fi
  MARK="$RUN_DIR/.done_s${SEED}"
  if [ -e "$MARK" ]; then
    echo "skip seed $SEED (done)"
    continue
  fi
  if python -m cleanba_tpu.benchmark \
      --env-ids Breakout-v5 --num-seeds 1 --start-seed "$SEED" \
      --timeout-minutes 60 --retries 1 --no-auto-tag \
      --command "$CMD"; then
    touch "$MARK"
  else
    echo "FAILED seed $SEED (continuing)"
  fi
done
