#!/usr/bin/env bash
# Package the orchestrator-driven HNS sweep into checked-in evidence:
# copy each run's TensorBoard event file to static/hns_curves/ and build
# HNS.md + static/hns_sweep.json with scripts/hns_aggregate.py.
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_DIR="${1:-runs/hns_sweep}"
OUT=static/hns_curves
mkdir -p "$OUT"
for d in "$RUN_DIR"/hns_*; do
  [ -d "$d" ] || continue
  name=$(basename "$d")
  # newest (completed) event file for the run
  ev=$(ls -t "$d"/events.out.tfevents.* 2>/dev/null | head -1)
  [ -n "$ev" ] && cp "$ev" "$OUT/${name}.tfevents"
done
ls "$OUT" | wc -l
python scripts/hns_aggregate.py --runs "$RUN_DIR/hns_*" \
  --out HNS.md --json static/hns_sweep.json \
  --title "IMPALA (Anakin), 4M env steps/game, 1 TPU v5e chip"
