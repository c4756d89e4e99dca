#!/usr/bin/env bash
# Orchestrator-driven HNS sweep (VERDICT r2 "next" #1): every native Atari
# task x 2 seeds through cleanba_tpu.benchmark (L10) -> runs/hns_sweep/...,
# then scripts/hns_aggregate.py turns the tfevents into HNS.md.
#
# Budgeted for one tunneled TPU v5e chip: Anakin IMPALA (the fastest
# learning path, ~45-55k env-steps/s) at --total-timesteps steps per run.
# The seed-1 pass over all games runs before the seed-2 pass so that a
# partially-completed sweep still covers the full catalog.
#
#   bash scripts/run_hns_sweep.sh 4000000 runs/hns_sweep
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-4000000}"
RUN_DIR="${2:-runs/hns_sweep}"
GAMES=$(python -c "from cleanba_tpu.envs import NATIVE_ATARI_TASKS as T; print(' '.join(T))")

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-180}"

CMD="python -m cleanba_tpu.train_impala_anakin \
  --local-num-envs 128 --num-steps 20 --bf16 \
  --total-timesteps $STEPS --log-frequency 20 \
  --run-dir $RUN_DIR --run-name hns_{env_id}_s{seed}"

for SEED in 1 2; do
  python -m cleanba_tpu.benchmark \
    --env-ids $GAMES --num-seeds 1 --start-seed "$SEED" \
    --timeout-minutes 12 --retries 1 --no-auto-tag \
    --command "$CMD"
done
