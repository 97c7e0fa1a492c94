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
  floor=$(awk '{print $3}' "/tmp/floor_$q.out" | sort -n | head -1)
  runs=$(awk '{print $3}' "/tmp/floor_$q.out" | paste -sd, -)
  [ -n "$floor" ] || { echo "FAILED $q — see $log"; exit 1; }
  [ $first -eq 1 ] || echo "," >> "$TMP"
  first=0
  printf '    "%s": {"floor_s": %s, "runs_s": [%s]}' "$q" "$floor" "$runs" >> "$TMP"
done
echo "" >> "$TMP"
echo "  }" >> "$TMP"
echo "}" >> "$TMP"
mv "$TMP" "$OUT"
echo "wrote $OUT"
