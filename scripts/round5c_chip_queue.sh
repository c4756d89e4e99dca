#!/usr/bin/env bash
# Round-5 third-window chip queue: the procgen engines now train at ~23k SPS
# on the Anakin path (an 8M run is ~6 min), so procgen breadth is cheap —
# push past the >=8-game bar toward the full 16-game suite, then spend any
# remaining window widening the Atari two-seed set.
#
#   bash scripts/round5c_chip_queue.sh <deadline_epoch>
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?usage: round5c_chip_queue.sh <deadline_epoch>}"

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
    echo "[queue5c] SKIP $name (only $(left)s left, needs ${need}s)"
    return 0
  fi
  local budget=$(( $(left) < cap ? $(left) : cap ))
  echo "[queue5c] stage: $name (budget ${budget}s, $(left)s to deadline)"
  timeout "$budget" "$@" || true
}

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-600}"
mkdir -p runs/hns10m runs/procgen_train

# 1. Four more procgen games at the full 8M budget (markers make re-entry
# free; one stage per game so the deadline can cut between games, never
# mid-table).
for G in Maze-v0 Leaper-v0 Fruitbot-v0 Plunder-v0; do
  stage "procgen $G" 500 900 \
    bash scripts/run_procgen_train.sh 8000000 runs/procgen_train "$G"
done

# 2. Remaining window: seed-2 fills over games that still have one seed
# (cheap wins first: each 10M run is ~4 min warm).
HNS_CMD="python -m cleanba_tpu.train_impala_anakin \
  --local-num-envs 128 --num-steps 20 --bf16 \
  --total-timesteps 10000000 --log-frequency 20 \
  --run-dir runs/hns10m --run-name hns_{env_id}_s{seed}"
for G in Freeway-v5 Kangaroo-v5 UpNDown-v5 Phoenix-v5 Alien-v5 \
         CrazyClimber-v5 RoadRunner-v5 NameThisGame-v5 Berzerk-v5 WizardOfWor-v5; do
  [ -e "runs/hns10m/.done_${G}_s2" ] && continue
  CLEANBA_FRAMESKIP_UNROLL=1 stage "seed-2 $G" 360 1500 \
    python -m cleanba_tpu.benchmark \
      --env-ids "$G" --num-seeds 1 --start-seed 2 \
      --timeout-minutes 22 --retries 1 --no-auto-tag --command "$HNS_CMD" \
    && touch "runs/hns10m/.done_${G}_s2"
done

echo "[queue5c] done ($(left)s before deadline)"
