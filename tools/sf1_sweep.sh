#!/usr/bin/env bash
# One-command 10x stress sweep: derive sf1 from the driver's sf0.1
# (10-way duplicated keys/documents — deliberately dup-dense), then
# run the full-registry bench on it, min-of-N with per-query spreads.
# Output: target/bench_sf1_final.json (the SURVEY §6 artifact).
#
# Usage: tools/sf1_sweep.sh [runs]   (default 2)
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS="${1:-2}"

if [ ! -f target/sf1/lineitem.parquet ]; then
  echo "== deriving sf1 from /root/testdata/sf0.1 =="
  python3 tools/gen_sf1.py target/sf1
fi

echo "== full-registry bench at sf1, min-of-$RUNS =="
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_RUNS="$RUNS" \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '{"metric".*}' > target/bench_sf1_final.json
python3 - <<'EOF'
import json
d = json.load(open('target/bench_sf1_final.json'))
qs = sorted(d['queries'].items(), key=lambda kv: -kv[1])
print(f"total {d['value']:.1f}s  errors={d['n_errors']}  plan_flips={d['plan_flips']}")
for k, v in qs[:10]:
    print(f"  {k:24s} {v:7.2f}s  spread {d['spread_pct'][k]:.0f}%")
EOF
