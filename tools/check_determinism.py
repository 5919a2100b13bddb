#!/usr/bin/env python3
"""Determinism gate: run graft.Verify at two different parallelism
levels and require every query's output ROWS to be identical as a
multiset (each query carries its own ORDER BY, but the file row order
after coalesce(1) is not part of the contract — content is).

Hardened against silent skips: both output dirs are wiped first (no
stale parquet can compare equal), the compared name set is the UNION of
both runs (a query failing on one side FAILs instead of vanishing), and
unreadable outputs are reported as failures.

Usage: python3 tools/check_determinism.py [sfdir]

The parallelism pair defaults to 3 vs 16; set GRAFT_DET_CPUS="1,32"
to run the checker's M=1 extreme (the reference checker's single-
worker analog) against the full local width.
"""
import os, shutil, subprocess, sys
from pathlib import Path

import pyarrow.parquet as pq

SF = ([a for a in sys.argv[1:] if not a.startswith("--")] or
      ["/root/testdata/sf0.001"])[0]
CPUS = [int(c) for c in
        os.environ.get("GRAFT_DET_CPUS", "3,16").split(",")]


def run(cpus, out):
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {out}"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-2000:])
        sys.exit(1)


def rows(d):
    t = pq.read_table(str(d))
    cols = sorted(t.column_names)
    return sorted(tuple(repr(r[c]) for c in cols) for r in
                  t.select(cols).to_pylist())


def main():
    a, b = "/tmp/graft_det_a", "/tmp/graft_det_b"
    run(CPUS[0], a)
    run(CPUS[1], b)
    names_a = {p.name for p in Path(a).iterdir() if p.is_dir()}
    names_b = {p.name for p in Path(b).iterdir() if p.is_dir()}
    bad = 0
    for name in sorted(names_a | names_b):
        if name not in names_a or name not in names_b:
            print(f"FAIL  {name}  (produced in only one run)")
            bad += 1
            continue
        try:
            ok = rows(Path(a) / name) == rows(Path(b) / name)
        except Exception as e:
            print(f"FAIL  {name}  (unreadable: {e})")
            bad += 1
            continue
        bad += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}")
    total = len(names_a | names_b)
    if total == 0:
        print("no query outputs produced — Verify broken?")
        sys.exit(1)
    print(f"\n{total - bad}/{total} identical across "
          f"cpus={CPUS[0]} vs {CPUS[1]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
