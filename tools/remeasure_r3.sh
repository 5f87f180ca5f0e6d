#!/bin/bash
# Round-3 re-measurement pass: re-run all six plain benchmark scripts at the
# RESULTS.md budgets with the current code (chunked device training by
# default, reference seed protocol in the evaluator, fixed off-policy action
# convention). Sequential — one TPU chip. Logs to tools/remeasure_logs/.
#
# Usage: bash tools/remeasure_r3.sh [script-basename ...]
#   (no args = all six in order, cheapest first)
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/remeasure_logs

run_one() {
  local script=$1 steps=$2
  local log="tools/remeasure_logs/${script%.py}.log"
  echo "=== $script (OGT_TIMESTEPS=$steps) start $(date +%T) ===" | tee -a "$log"
  OGT_TIMESTEPS=$steps timeout 3600 python "benchmarks/$script" >>"$log" 2>&1
  local rc=$?
  echo "=== $script exit=$rc end $(date +%T) ===" | tee -a "$log"
}

if [ $# -gt 0 ]; then
  for s in "$@"; do
    case "$s" in
      benchmark_newsvendor.py|benchmark_newsvendor_combined.py) run_one "$s" 4000000 ;;
      *) run_one "$s" 2000000 ;;
    esac
  done
  exit 0
fi

run_one benchmark_net_inv_backlog.py 2000000
run_one benchmark_net_inv_lost_sales.py 2000000
run_one benchmark_inv_management_backlog.py 2000000
run_one benchmark_inv_management_lost_sales.py 2000000
run_one benchmark_newsvendor.py 4000000
run_one benchmark_newsvendor_combined.py 4000000
echo "ALL DONE $(date +%T)"
