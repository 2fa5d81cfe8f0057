#!/usr/bin/env python3
"""Cross-engine check for the BPE oracle's degenerate-corpus arm
(round-11 verdict #1c): on a corpus that admits FEWER merges than the
oracle's 3-stage chain, the Spark side learns what it can and stops,
and the oracle's empty merge CTEs must PASS SYMBOLS THROUGH (LEFT JOIN
ON TRUE + COALESCE in bpeRewriteSql) instead of emptying the chain.

Builds a 2-merge corpus ("abc": merge1 a+b, merge2 ab+c, then no pair
remains), runs graft.Verify for q214/q218 over it, replays the dumped
oracle SQL in DuckDB over the same parquet, and diffs — the same
compare discipline as check_parity.py, on the corpus the fixture
can't reach.

Usage: python3 tools/check_bpe_degenerate.py [workdir]
"""
import json
import os
import subprocess
import sys

import duckdb
import glob
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["q214_bpe_merges", "q218_bpe_apply"]


def main(work="/tmp/graft_bpe_degenerate"):
    sf_dir = os.path.join(work, "data")
    out_dir = os.path.join(work, "out")
    os.makedirs(sf_dir, exist_ok=True)
    # 2-merge corpus: every word is "abc" — merge1 (a,b), merge2 (ab,c),
    # then every word is a single symbol and p3 is EMPTY
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["abc abc", "abc", "abc abc abc"],
        "lang": ["en", "en", "en"],
        "source": ["src0", "src1", "src0"],
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    docs.to_parquet(os.path.join(sf_dir, "documents.parquet"))

    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir} " +
         ",".join(QUERIES)], cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("graft.Verify failed on the degenerate corpus")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = []
    for name in QUERIES:
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
        exp = con.execute(oracle[name]).df()
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            failures.append((name, f"columns {list(got.columns)} vs "
                             f"{list(exp.columns)}"))
            continue
        if not got.astype(str).equals(exp.astype(str)):
            failures.append((name, f"values differ:\nspark:\n{got}\n"
                             f"oracle:\n{exp}"))
            continue
        print(f"{name}: OK ({len(got)} rows)")
        if name == "q214_bpe_merges" and len(got) != 2:
            failures.append((name, f"expected exactly 2 learned merges, "
                             f"got {len(got)}"))
    if failures:
        for n, why in failures:
            print(f"FAIL {n}: {why}")
        raise SystemExit(1)
    print("bpe degenerate-corpus parity: all green")


if __name__ == "__main__":
    main(*sys.argv[1:])
