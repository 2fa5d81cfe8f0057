#!/usr/bin/env bash
# Per-round closing gate (round-10 verdict #4: the tri-scale sweep must
# run at the FULL query count every round, after the last query lands).
#
# Runs the bench at all three fixture scales, then:
#   - the scaling-slope audit (flags super-linear sf0.01 -> sf0.1 steps),
#   - the regressions section of the sf0.1 bench line (vs best-known),
# and finally folds the fresh sf0.1 mins into tools/bench_best.json.
#
# Usage: tools/closing_gate.sh [outdir]   (default /tmp/graft_gate)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_gate}"
mkdir -p "$OUT"

for sf in 0.001 0.01 0.1; do
  echo "=== bench sf$sf ==="
  SPARK_GRAFT_SF_DIR="/root/testdata/sf$sf" SPARK_GRAFT_CPUS=32 \
    sbt -batch 'runMain graft.Bench' | tee "$OUT/bench_sf$sf.raw" \
    | grep '^{"queries"' > "$OUT/bench_sf$sf.json"
done

echo "=== scaling slopes (flag = super-linear) ==="
python3 tools/scaling_slopes.py \
  "$OUT/bench_sf0.001.json" "$OUT/bench_sf0.01.json" "$OUT/bench_sf0.1.json" \
  | tee "$OUT/slopes.md"

echo "=== regressions vs best-known (explain each in SCALE.md) ==="
python3 - "$OUT/bench_sf0.1.json" <<'EOF'
import json, sys
doc = json.load(open(sys.argv[1]))
reg = doc.get("regressions", {})
if not reg:
    print("none")
for q, ratio in sorted(reg.items(), key=lambda kv: -kv[1]):
    print(f"{q}: {ratio:.2f}x over best-known")
EOF

python3 tools/update_bench_best.py "$OUT/bench_sf0.1.json"
echo "closing gate done; artifacts in $OUT"
