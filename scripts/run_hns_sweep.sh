#!/usr/bin/env bash
# Orchestrator-driven HNS sweep (VERDICT r2 "next" #1): every native Atari
# task x 2 seeds through cleanba_tpu.benchmark (L10) -> runs/hns_sweep/...,
# then scripts/hns_aggregate.py turns the tfevents into HNS.md.
#
# Budgeted for one tunneled TPU v5e chip: Anakin IMPALA (the fastest
# learning path, ~34k env-steps/s inside the full trainer loop) at
# --total-timesteps steps per run. The seed-1 pass over all games runs
# before the seed-2 pass so that a partially-completed sweep still covers
# the full catalog. Each (game, seed) job is launched through its own
# orchestrator invocation and leaves a .done marker, so a crashed or killed
# sweep resumes where it left off and one game's failure never aborts the
# rest of the catalog.
#
#   bash scripts/run_hns_sweep.sh 10000000 runs/hns10m
#
# Graceful hand-off: `touch <RUN_DIR>/.stop` makes the sweep exit cleanly
# after the in-flight game finishes (markers make the next launch resume).
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-10000000}"
RUN_DIR="${2:-runs/hns10m}"
# Always sweep missing seed-1 runs first (done markers make repeats free):
# game waves landing after a sweep launch still get seed-1 coverage before
# any seed-2 pass starts.
SEEDS="1 ${SEEDS:-2}"
# GAMES_OVERRIDE narrows the sweep to a named subset (calibration re-runs,
# seed-2 passes, long-budget re-runs); default is the full native catalog.
GAMES="${GAMES_OVERRIDE:-$(python -c "from cleanba_tpu.envs import NATIVE_ATARI_TASKS as T; print(' '.join(T))")}"
TIMEOUT_MIN="${TIMEOUT_MIN:-25}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
# Generous: first-compile through the tunnel can exceed 3 min under host load.
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-600}"
# Trade ~15% env-step runtime for a several-x cheaper per-game first compile
# (28 distinct game programs compile once each; see jax_engine.py step()).
export CLEANBA_FRAMESKIP_UNROLL="${CLEANBA_FRAMESKIP_UNROLL:-1}"
mkdir -p "$RUN_DIR"

CMD="python -m cleanba_tpu.train_impala_anakin \
  --local-num-envs 128 --num-steps 20 --bf16 \
  --total-timesteps $STEPS --log-frequency 20 \
  --run-dir $RUN_DIR --run-name hns_{env_id}_s{seed}"

for SEED in $SEEDS; do
  for GAME in $GAMES; do
    if [ -e "$RUN_DIR/.stop" ]; then
      echo "stop requested; exiting cleanly"
      exit 0
    fi
    MARK="$RUN_DIR/.done_${GAME}_s${SEED}"
    if [ -e "$MARK" ]; then
      echo "skip $GAME seed $SEED (done)"
      continue
    fi
    if python -m cleanba_tpu.benchmark \
        --env-ids "$GAME" --num-seeds 1 --start-seed "$SEED" \
        --timeout-minutes "$TIMEOUT_MIN" --retries 1 --no-auto-tag \
        --command "$CMD"; then
      touch "$MARK"
    else
      echo "FAILED $GAME seed $SEED (continuing)"
    fi
  done
done
