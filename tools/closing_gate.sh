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

echo "=== regressions vs best-known (each must carry a ledger entry) ==="
# A flagged regression is only acceptable when tools/regression_ledger.json
# explains it (accepted plan change, re-measurement, fixture change) at a
# ratio no worse than recorded — an unexplained or worsened flag FAILS the
# gate, so a plan regression can't ride through on silence (round-11
# verdict #4: the gate caught q53 and nobody wrote the explanation).
python3 - "$OUT/bench_sf0.1.json" <<'EOF'
import json, os, sys
doc = json.load(open(sys.argv[1]))
reg = doc.get("regressions", {})
ledger = {}
if os.path.exists("tools/regression_ledger.json"):
    ledger = json.load(open("tools/regression_ledger.json"))
bad = []
if not reg:
    print("none")
for q, ratio in sorted(reg.items(), key=lambda kv: -kv[1]):
    entry = ledger.get(q)
    if entry is None:
        print(f"{q}: {ratio:.2f}x over best-known — NO LEDGER ENTRY")
        bad.append(q)
    elif ratio > 1.25 * float(entry.get("accepted_ratio", 0)):
        print(f"{q}: {ratio:.2f}x over best-known — WORSE than the "
              f"ledgered {entry['accepted_ratio']}x (stale explanation)")
        bad.append(q)
    else:
        print(f"{q}: {ratio:.2f}x over best-known — ledgered (r{entry.get('round')}): "
              f"{entry['reason'][:100]}")
if bad:
    print(f"GATE FAIL: unexplained regressions: {bad} — add entries to "
          f"tools/regression_ledger.json (and SCALE.md) or fix the plan",
          file=sys.stderr)
    sys.exit(1)
EOF

python3 tools/update_bench_best.py "$OUT/bench_sf0.1.json"
echo "closing gate done; artifacts in $OUT"
