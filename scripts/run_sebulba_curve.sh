#!/usr/bin/env bash
# Sebulba long-run learning curve with real checkpoints (VERDICT r3 "next"
# #3): Breakout PPO through the complete actor/queue/learner runtime, run in
# resumable chunks. Each invocation extends the SAME run via --resume until
# the target step count; checkpoints land under the run dir so a later
# session (or the next round) continues where this one stopped.
#
#   bash scripts/run_sebulba_curve.sh 25000000 runs/sebulba50
set -uo pipefail
cd "$(dirname "$0")/.."

TARGET="${1:-25000000}"
RUN_DIR="${2:-runs/sebulba50}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-900}"
mkdir -p "$RUN_DIR"

python -m cleanba_tpu.train_ppo \
  --env-id Breakout-v5 --seed 1 \
  --local-num-envs 64 --num-actor-threads 2 --num-steps 128 \
  --num-minibatches 4 --update-epochs 4 --bf16 --concurrency --device-stack \
  --total-timesteps "$TARGET" \
  --checkpoint-frequency 50 --resume \
  --log-frequency 10 \
  --run-dir "$RUN_DIR" --run-name sebulba_breakout_50M
