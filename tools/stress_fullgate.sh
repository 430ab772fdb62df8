#!/bin/bash
# Full-gate stress: N complete check_oracle sweeps (driver conditions —
# every query in one fresh Ray session), logging any FAIL line.
set -u
N=${1:-5}
CPUS=${2:-32}
FAILS=0
for i in $(seq 1 "$N"); do
  echo "=== full sweep $i/$N ==="
  RAY_GRAFT_CPUS=$CPUS python - <<'EOF'
import sys
sys.argv = ["check_oracle"]
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from tools.check_oracle import main
raise SystemExit(main())
EOF
  rc=$?
  [ $rc -ne 0 ] && FAILS=$((FAILS + 1))
done
echo "=== stress_fullgate: $FAILS failing sweeps of $N ==="
exit $((FAILS > 0))
