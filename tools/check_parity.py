#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
first (sbt "runMain graft.Verify <sfDir> <outDir>"), then this script
replays outDir/oracle_sql.json in DuckDB over the same parquet tables
and diffs each query's parquet dump against the oracle result.

Usage: python3 tools/check_parity.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output")); continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            failures.append((name, f"read failed: {e}")); continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}")); continue
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}")); continue
        if len(got) != len(exp):
            failures.append((name, f"rows differ: {len(got)} vs {len(exp)}")); continue
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype != b.dtype:
                bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
            try:
                if a.dtype == object:
                    neq = (a.astype(str) != b.astype(str))
                else:
                    av, bv = a.to_numpy(), b.to_numpy()
                    neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy() if hasattr(neq, "to_numpy") else neq))
                    bad.append(f"{c}: {int(neq.sum())} mismatches, first at row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            failures.append((name, "; ".join(bad)))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    no_oracle = set(glob.glob(f"{out_dir}/q*"))
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracled queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
