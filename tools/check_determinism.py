#!/usr/bin/env python3
"""Determinism gate: run graft.Verify at two different parallelism
levels and require every query's output to be IDENTICAL (the engine's
analog of the reference checker's M x R matrix — parallelism must never
change results).

Usage: python3 tools/check_determinism.py [sfdir]
"""
import subprocess, sys
from pathlib import Path

import pyarrow.parquet as pq

SF = ([a for a in sys.argv[1:] if not a.startswith("--")] or
      ["/root/testdata/sf0.001"])[0]


def run(cpus, out):
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {out}"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": str(cpus)})
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
    run(3, a)
    run(16, b)
    bad = 0
    names = sorted(p.name for p in Path(a).iterdir() if p.is_dir())
    for name in names:
        ra, rb = rows(Path(a) / name), rows(Path(b) / name)
        ok = ra == rb
        bad += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}")
    print(f"\n{len(names) - bad}/{len(names)} identical across cpus=3 vs 16")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
