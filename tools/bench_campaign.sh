#!/bin/bash
# Sequential full-protocol bench runs for the scaling-gate campaign
# (VERDICT r5 item 1): run graft.Bench N times back-to-back on an
# otherwise-idle host, saving each log + the one-line JSON. Usage:
#   tools/bench_campaign.sh <n_runs> <outdir>
set -u
N=${1:-3}
OUT=${2:-/tmp/bench_campaign}
mkdir -p "$OUT"
cd /root/repo
for i in $(seq 1 "$N"); do
  # date-qualified so multi-day campaigns reusing one outdir never
  # overwrite earlier evidence
  ts=$(date +%Y%m%d_%H%M%S)
  log="$OUT/run_${ts}.log"
  echo "[campaign] run $i/$N -> $log"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" >"$log" 2>&1
  grep -ao '{"metric":"parsed_routed.*}' "$log" | tail -1 >"$OUT/run_${ts}.json"
  cp BENCH.md "$OUT/run_${ts}_BENCH.md" 2>/dev/null || true
done
echo "[campaign] done"
