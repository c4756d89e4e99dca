#!/usr/bin/env bash
# One-shot round-5 insertion: stop the chip queue + in-flight sweep job (by
# exact command-line match, never by broad pattern), retrain the three
# re-calibrated games, then relaunch the queue (all stages are
# marker-resumable). Usage: bash scripts/r5_insert.sh <deadline_epoch>
set -uo pipefail
cd "$(dirname "$0")/.."
DEADLINE="${1:?deadline}"

pids_of() {  # exact-substring process match via ps (bracket trick: the grep
  ps -eo pid,args | grep "$1" | awk '{print $1}'
}

for PAT in "[r]ound5_chip_queue.sh" "[r]un_hns_sweep.sh" \
           "[c]leanba_tpu.benchmark" "[c]leanba_tpu.train_impala_anakin"; do
  for P in $(pids_of "$PAT"); do
    kill "$P" 2>/dev/null || true
  done
done
sleep 5
for PAT in "[c]leanba_tpu.train_impala_anakin"; do
  for P in $(pids_of "$PAT"); do
    kill -9 "$P" 2>/dev/null || true
  done
done
sleep 3

# Clear the three re-calibrated games and any partial (marker-less) seed-2
# run dir from the interrupted job.
TS=$(date +%s)
for G in ${INSERT_GAMES:-MontezumaRevenge-v5 IceHockey-v5 Venture-v5}; do
  mkdir -p runs/hns10m_superseded
  [ -d "runs/hns10m/hns_${G}_s1" ] && \
    mv "runs/hns10m/hns_${G}_s1" "runs/hns10m_superseded/hns_${G}_s1_${TS}"
  rm -f "runs/hns10m/.done_${G}_s1"
done
for D in runs/hns10m/hns_*_s2; do
  [ -d "$D" ] || continue
  G=$(basename "$D" | sed 's/^hns_//; s/_s2$//')
  [ -e "runs/hns10m/.done_${G}_s2" ] || rm -rf "$D"
done

GAMES_OVERRIDE="${INSERT_GAMES:-MontezumaRevenge-v5 IceHockey-v5 Venture-v5}" SEEDS=1 \
  bash scripts/run_hns_sweep.sh 10000000 runs/hns10m

nohup bash scripts/round5_chip_queue.sh "$DEADLINE" > runs/queue5.log 2>&1 &
echo "insert done; queue relaunched ($!)"
