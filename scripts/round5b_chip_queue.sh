#!/usr/bin/env bash
# Round-5 second-window chip queue. The sandbox between sessions dropped the
# untracked runs/ tree (markers + checkpoints), so this queue only runs jobs
# that stand alone without prior run state, in banked-wins order:
#
#   1. seed-2 KungFuMaster @10M   — 12th game with >=2 seeds (verdict r4 #3)
#   2. procgen Jumper @8M          — 7th full-budget procgen game (r4 #6)
#   3. procgen Ninja @8M           — 8th, reaching the >=8 criterion
#
# Same stage/deadline discipline as round5_chip_queue.sh: a stage is skipped
# when the deadline can't fit it, and each stage waits for the previous
# trainer to fully exit before taking the chip.
#
#   bash scripts/round5b_chip_queue.sh <deadline_epoch>
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?usage: round5b_chip_queue.sh <deadline_epoch>}"

left() { echo $((DEADLINE - $(date +%s))); }
drain() {
  while pgrep -f "cleanba_tpu.train" > /dev/null 2>&1; do sleep 10; done
  sleep 5
}
stage() {  # stage <name> <min_needed> <cap> <cmd...>
  local name="$1" need="$2" cap="$3"
  shift 3
  drain
  if [ "$(left)" -lt "$need" ]; then
    echo "[queue5b] SKIP $name (only $(left)s left, needs ${need}s)"
    return 0
  fi
  local budget=$(( $(left) < cap ? $(left) : cap ))
  echo "[queue5b] stage: $name (budget ${budget}s, $(left)s to deadline)"
  timeout "$budget" "$@" || true
}

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-600}"
mkdir -p runs/hns10m runs/procgen_train

# 1. 12th two-seed game: KungFuMaster seed 2 at the sweep config.
HNS_CMD="python -m cleanba_tpu.train_impala_anakin \
  --local-num-envs 128 --num-steps 20 --bf16 \
  --total-timesteps 10000000 --log-frequency 20 \
  --run-dir runs/hns10m --run-name hns_{env_id}_s{seed}"
CLEANBA_FRAMESKIP_UNROLL=1 stage "seed-2 KungFuMaster" 420 1500 \
  python -m cleanba_tpu.benchmark \
    --env-ids KungFuMaster-v5 --num-seeds 1 --start-seed 2 \
    --timeout-minutes 22 --retries 1 --no-auto-tag --command "$HNS_CMD"

# 2+3. Procgen Jumper then Ninja at the full 8M budget (markers under
# runs/procgen_train keep a re-invocation free).
stage "procgen Jumper" 900 2700 \
  bash scripts/run_procgen_train.sh 8000000 runs/procgen_train "Jumper-v0"
stage "procgen Ninja" 900 2700 \
  bash scripts/run_procgen_train.sh 8000000 runs/procgen_train "Ninja-v0"

echo "[queue5b] done ($(left)s before deadline)"
