#!/usr/bin/env python3
"""One-off smoke: compare one query's Spark output vs its DuckDB
oracle SQL without running the full Verify suite. Deleted after use or
kept as a fast dev probe."""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

Q = sys.argv[1] if len(sys.argv) > 1 else "pca_top_component"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = Path("/tmp/graft_pca_smoke")

r = subprocess.run(
    ["sbt", "-batch", f"runMain graft.VerifyOne {Q} {SF} {OUT}"],
    capture_output=True, text=True, cwd="/root/repo")
if r.returncode != 0:
    print(r.stdout[-3000:], r.stderr[-2000:])
    sys.exit(1)

oracle = json.loads((OUT / "oracle_sql.json").read_text())[Q]
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
want = con.execute(oracle).fetch_arrow_table()
got = pq.read_table(str(OUT / Q))

def rows(t):
    cols = sorted(t.column_names)
    return sorted(tuple(repr(r[c]) for c in cols) for r in t.select(cols).to_pylist()), cols

gr, gc = rows(got)
wr, wc = rows(want)
print("spark cols", gc, "oracle cols", wc)
print("rows", len(gr), len(wr))
mism = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
print("mismatched rows:", len(mism))
for i in mism[:8]:
    print(" spark:", gr[i], "\n duck :", wr[i])
sys.exit(0 if not mism and len(gr) == len(wr) and gc == wc else 1)
