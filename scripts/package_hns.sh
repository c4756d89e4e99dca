#!/usr/bin/env bash
# Package the orchestrator-driven HNS sweeps into checked-in evidence:
# copy each run's TensorBoard event file to static/hns_curves/ and build
# HNS.md + static/hns_sweep.json with scripts/hns_aggregate.py. Accepts any
# number of run dirs (10M sweep + 50M re-run dirs); the aggregator keeps the
# longest run per (game, seed).
#
#   bash scripts/package_hns.sh runs/hns10m runs/hns50m
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_DIRS=("${@:-runs/hns10m}")
OUT=static/hns_curves
mkdir -p "$OUT"
# Rebuild the packaged set from scratch so re-run games never leave a stale
# pre-calibration curve behind.
rm -f "$OUT"/*.tfevents
GLOBS=()
for RUN_DIR in "${RUN_DIRS[@]}"; do
  GLOBS+=("$RUN_DIR/hns_*")
  tag=$(basename "$RUN_DIR")
  for d in "$RUN_DIR"/hns_*; do
    [ -d "$d" ] || continue
    name=$(basename "$d")
    # newest (completed) event file for the run
    ev=$(ls -t "$d"/events.out.tfevents.* 2>/dev/null | head -1)
    [ -n "$ev" ] && cp "$ev" "$OUT/${tag}_${name}.tfevents"
  done
done
ls "$OUT" | wc -l
python scripts/hns_aggregate.py --runs "${GLOBS[@]}" \
  --out HNS.md --json static/hns_sweep.json \
  --title "IMPALA (Anakin), 10M env steps/game (50M re-runs where marked), 1 TPU v5e chip"
