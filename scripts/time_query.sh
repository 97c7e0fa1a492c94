#!/bin/bash
# Time single queries standalone at a given SF: scripts/time_query.sh sfdir q1 [q2 ...]
# Uses the Bench noop-write shape (full plan execution) on a fresh session each.
set -e
cd "$(dirname "$0")/.."   # repo root, so this works from any cwd
SF="$1"; shift
for q in "$@"; do
  # stderr to a log, not /dev/null: a bad query name or Spark failure
  # must leave a diagnostic, not exit silently
  log="/tmp/timeone_$q.log"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    scripts/run.sh graft.TimeOne "$q" 2>"$log" \
    || { echo "FAILED $q — see $log"; exit 1; }
done
