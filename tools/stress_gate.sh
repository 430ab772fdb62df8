#!/bin/bash
# Fresh-process stress loop for the correctness gate (VERDICT r02 item 1).
# Each iteration is a brand-new Ray session + DuckDB connection, matching
# the driver's one-shot gate conditions. Usage:
#   tools/stress_gate.sh N_PROCS REPS_PER_PROC query [query ...]
set -u
N=${1:-20}
REPS=${2:-3}
shift 2
FAILS=0
for i in $(seq 1 "$N"); do
  echo "=== process $i/$N ==="
  python tools/stress_gate.py "$@" --reps "$REPS" --num-cpus "${STRESS_CPUS:-32}" \
    || FAILS=$((FAILS + 1))
done
echo "=== stress_gate.sh: $FAILS failing processes of $N ==="
exit $((FAILS > 0))
