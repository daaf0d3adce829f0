#!/bin/bash
# Repeat bench.py until a run finishes with no steal contamination
# (VERDICT r13 ask #1: the round needs at least one clean measurement;
# the noisy neighbour is bursty, so pre-gating alone cannot guarantee
# one). Each attempt is kept (BENCH_local_r{N}_attempt{i}.json); the
# first clean attempt is also copied to BENCH_local_r{N}_final.json.
set -u
ROUND="${1:-r14}"
MAX_ATTEMPTS="${2:-8}"
cd /root/repo
for i in $(seq 2 "$MAX_ATTEMPTS"); do
  out="BENCH_local_${ROUND}_attempt${i}.json"
  SPARK_GRAFT_BENCH_IDLE_WAIT_S=1800 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 python bench.py > "$out" 2>>/tmp/bench_${ROUND}.err
  if python - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
h = d.get("host", {})
# clean = no hypervisor steal AND no same-host co-runner (a concurrent
# dev workload inflates timings without tripping the steal stamp; it
# shows as depressed idle_frac / elevated load instead)
ok = (
    not h.get("steal_contaminated")
    and (h.get("idle_frac") is None or h["idle_frac"] >= 0.5)
    and (h.get("load1_after") is None or h["load1_after"] < 10.0)
)
sys.exit(0 if ok else 1)
EOF
  then
    cp "$out" "BENCH_local_${ROUND}_final.json"
    echo "CLEAN at attempt $i"
    exit 0
  fi
  sleep 300
done
echo "no clean attempt in $MAX_ATTEMPTS tries"
exit 2
