#!/usr/bin/env bash
# Procgen learning evidence (VERDICT r3 "next" #6): train >=3 procgen games
# through the orchestrator on the Anakin path, >=8M env-steps each, then
# aggregate final returns for the procgen section of HNS.md.
#
#   bash scripts/run_procgen_train.sh 8000000 runs/procgen_train
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-8000000}"
RUN_DIR="${2:-runs/procgen_train}"
GAMES="${3:-Bigfish-v0 Starpilot-v0 Chaser-v0 Coinrun-v0 Miner-v0 Heist-v0 Jumper-v0 Ninja-v0}"
TIMEOUT_MIN="${TIMEOUT_MIN:-50}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
export CLEANBA_PROGRESS_TIMEOUT="${CLEANBA_PROGRESS_TIMEOUT:-600}"
mkdir -p "$RUN_DIR"

# Procgen PPO-ish config on the Anakin trainer: 64 envs x T=256 like the
# reference procgen script (legacy_scripts/cleanba_ppo_envpool_procgen.py:
# num_envs 64, num_steps 256, lr 5e-4, ent 0.01, gamma 0.999).
CMD="python -m cleanba_tpu.train_ppo_anakin \
  --local-num-envs 64 --num-steps 256 --num-minibatches 8 --update-epochs 3 \
  --learning-rate 5e-4 --gamma 0.999 --ent-coef 0.01 --bf16 \
  --total-timesteps $STEPS --log-frequency 5 --save-model \
  --checkpoint-frequency 100 --resume \
  --run-dir $RUN_DIR --run-name pg_{env_id}_s{seed}"

for GAME in $GAMES; do
  if [ -e "$RUN_DIR/.stop" ]; then
    echo "stop requested; exiting cleanly"
    exit 0
  fi
  MARK="$RUN_DIR/.done_${GAME}"
  if [ -e "$MARK" ]; then
    echo "skip $GAME (done)"
    continue
  fi
  if python -m cleanba_tpu.benchmark \
      --env-ids "$GAME" --num-seeds 1 --start-seed 1 \
      --timeout-minutes "$TIMEOUT_MIN" --retries 1 --no-auto-tag \
      --command "$CMD"; then
    touch "$MARK"
  else
    echo "FAILED $GAME (continuing)"
  fi
done
