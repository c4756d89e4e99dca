#!/usr/bin/env bash
# Round-4 chip-job queue: serializes every remaining single-chip job in
# verdict-priority order once the in-flight seed-1 HNS sweep (over the
# pre-wave-9 catalog) finishes. Each stage is individually resumable and
# individually bounded, so a slow stage cannot starve the ones after it.
#
#   bash scripts/round4_chip_queue.sh >> /tmp/chip_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

SWEEP_DIR=runs/hns10m
OLD_GAMES=30   # catalog size the in-flight sweep was launched with

echo "[queue] waiting for the seed-1 sweep over the original $OLD_GAMES games"
while true; do
  n=$(ls -a "$SWEEP_DIR" 2>/dev/null | grep -c "^\.done_.*_s1$" || true)
  if [ "$n" -ge "$OLD_GAMES" ]; then break; fi
  sleep 60
done
echo "[queue] original catalog done; stopping the running sweep cleanly"
touch "$SWEEP_DIR/.stop"
# Wait for the sweep process to release the chip (its in-flight game ends).
while pgrep -f "train_impala_anakin.*$SWEEP_DIR" > /dev/null 2>&1; do sleep 20; done
sleep 10
rm -f "$SWEEP_DIR/.stop"

echo "[queue] stage 1: seed-1 sweep over the wave-9 games (new catalog)"
SEEDS=1 timeout 7200 bash scripts/run_hns_sweep.sh 10000000 "$SWEEP_DIR"

echo "[queue] stage 2: dispatch-pipeline perf sweep + anakin re-measure"
timeout 2400 python scripts/perf_sweep.py --pipeline --skip-async \
  --skip-sebulba --out static/perf_sweep_r4.jsonl

echo "[queue] stage 3: procgen learning runs"
timeout 2700 bash scripts/run_procgen_train.sh 8000000 runs/procgen_train

echo "[queue] stage 4: Sebulba curve chunk (checkpointed, resumable)"
timeout 3300 bash scripts/run_sebulba_curve.sh 50000000 runs/sebulba50 || true

echo "[queue] stage 5: seed-variance 50M runs"
timeout 4200 bash scripts/run_seed_variance.sh 50000000 runs/seed_variance

echo "[queue] stage 6: seed-2 sweep (whatever time remains)"
SEEDS=2 bash scripts/run_hns_sweep.sh 10000000 "$SWEEP_DIR"
