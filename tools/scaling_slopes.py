#!/usr/bin/env python3
"""Scaling-slope audit: compare per-query Bench times across fixture
scales and flag super-linear growth.

Usage:
  python3 tools/scaling_slopes.py bench_sf0.001.json bench_sf0.01.json bench_sf0.1.json

Each input is one Bench JSON line (the bench's stdout). Fixture scales
step 10x, so a perfectly linear query grows <=10x per step — in
practice much less, because fixed plan/JVM overhead dominates small
SFs. A step ratio well ABOVE 10 is the smell of a hidden O(N^2) (or a
broadcast/build that stopped fitting). Queries under MIN_SECS at the
largest scale are skipped: their times are overhead, not data work.

Output: a markdown table (stdout) sorted by the sf0.01->sf0.1 ratio,
with a SUPERLINEAR flag on ratios > FLAG_RATIO.
"""
import json
import sys

MIN_SECS = 0.5      # at the largest scale; below this it's all overhead
FLAG_RATIO = 12.0   # 10x data -> >12x time = super-linear (20% slack)


def load(path):
    with open(path) as f:
        txt = f.read()
    # the bench line may be embedded in logs; take the last JSON object
    for line in reversed(txt.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main(paths):
    if len(paths) < 2:
        raise SystemExit(
            "need at least two bench files (one per scale) to compute "
            "slopes — see the usage line in the module docstring")
    benches = [load(p) for p in paths]
    sfs = [b.get("sf", p) for b, p in zip(benches, paths)]
    qs = [b["queries"] for b in benches]
    names = sorted(set(qs[-1]) & set(qs[0]) & set(qs[1] if len(qs) > 2 else qs[0]))
    rows = []
    for n in names:
        t = [q.get(n) for q in qs]
        if t[-1] is None or t[-1] < MIN_SECS or any(x is None or x <= 0 for x in t):
            continue
        ratios = [t[i + 1] / t[i] for i in range(len(t) - 1)]
        rows.append((n, t, ratios))
    rows.sort(key=lambda r: -r[2][-1])
    hdr_sf = " | ".join(f"t({s.split('/')[-1]})" for s in sfs)
    hdr_r = " | ".join(
        f"x{sfs[i].split('/')[-1]}→{sfs[i+1].split('/')[-1]}"
        for i in range(len(sfs) - 1))
    print(f"| query | {hdr_sf} | {hdr_r} | flag |")
    print("|---" * (1 + len(sfs) + len(sfs) - 1) + "|---|")
    n_flagged = 0
    for n, t, ratios in rows:
        flag = "SUPERLINEAR" if ratios[-1] > FLAG_RATIO else ""
        n_flagged += bool(flag)
        ts = " | ".join(f"{x:.2f}" for x in t)
        rs = " | ".join(f"{r:.1f}" for r in ratios)
        print(f"| {n} | {ts} | {rs} | {flag} |")
    print(f"\n{len(rows)} queries >= {MIN_SECS}s at {sfs[-1]}; "
          f"{n_flagged} flagged > {FLAG_RATIO}x per 10x step")


if __name__ == "__main__":
    main(sys.argv[1:])
