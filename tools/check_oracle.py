#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare row-by-row (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = Path(_pos[1] if len(_pos) > 1 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    arr = tbl.select(cols).to_pylist()
    return sorted(tuple(norm(r[c]) for c in cols) for r in arr), cols


def main():
    run_verify = "--no-verify" not in sys.argv
    if run_verify:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)

    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = {s.strip() for s in a[len("--only="):].split(",") if s.strip()}
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    # big-SF runs: insertion-order preservation forces full
    # materialization of giant intermediates (the sf1 pagerank CTE chain
    # spilled >79 GB of temp and died on disk); row order is irrelevant
    # here — the compare sorts rows itself
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # driver testdata ships single files; ScaleUp output (data/sf1.0)
        # is Spark-style directories of part files — glob those
        path = Path(SF) / f"{t}.parquet"
        src = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    results = {}
    import time
    # Above this row count the detailed Python compare (to_pylist +
    # sort) is skipped: it holds every row as a tuple of repr strings
    # (a 51M-row levenshtein_pairs at sf1 would need ~50 GB). The
    # in-DuckDB digest below is the gate at any size; the Python path
    # only runs to produce a row-level diff on small mismatches.
    DETAIL_MAX = 2_000_000

    def digest(src_sql, cols):
        """(count, sum, bit_xor, salted-sum of row hashes) with every
        column cast to VARCHAR in sorted-column order —
        order-independent, multiset-exact up to hash collisions, O(1)
        memory. NULL is tagged distinctly from any string value.
        A plain additive sum admits cancellation (two compensating row
        errors); combining sum + bit_xor + an independently-salted sum
        means compensating errors would have to cancel in all three
        aggregates simultaneously."""
        expr = ", ".join(
            f"coalesce(CAST(\"{c}\" AS VARCHAR), chr(1) || 'NULL')"
            for c in cols)
        row = con.execute(
            f"SELECT count(*),"
            f" sum(hash(concat_ws(chr(31), {expr}))),"
            f" bit_xor(hash(concat_ws(chr(31), {expr}))),"
            f" sum(hash(chr(2) || concat_ws(chr(31), {expr})))"
            f" FROM ({src_sql})").fetchone()
        return row[0], (row[1], row[2], row[3])

    for name, sql in sorted(oracle.items()):
        out_dir = OUT / name
        if not out_dir.exists():
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        t0 = time.time()
        try:
            spark_src = f"SELECT * FROM read_parquet('{out_dir}/*.parquet')"
            got_cols = sorted(pq.read_schema(
                next(Path(out_dir).glob("*.parquet"))).names)
            want_cols = sorted(
                r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall())
            if got_cols != want_cols:
                results[name] = f"SCHEMA: spark={got_cols} duck={want_cols}"
                continue
            got_n, got_h = digest(spark_src, got_cols)
            want_n, want_h = digest(sql, want_cols)
            if got_n != want_n:
                results[name] = f"ROWS: spark={got_n} duck={want_n}"
            elif got_h != want_h:
                if got_n <= DETAIL_MAX:
                    got, _ = table_rows(pq.read_table(str(out_dir)))
                    want, _ = table_rows(con.execute(sql).fetch_arrow_table())
                    bad = next((i for i, (a, b) in enumerate(zip(got, want))
                                if a != b), None)
                    if bad is None:
                        # digest mismatch but reprs equal: varchar-cast
                        # drift (e.g. decimal scale) — surface it
                        results[name] = ("HASH differs but Python reprs "
                                         "equal (cast drift)")
                    else:
                        results[name] = (f"VALUES differ at sorted-row {bad}:"
                                         f"\n  spark={got[bad]}"
                                         f"\n  duck ={want[bad]}")
                else:
                    results[name] = f"HASH: spark={got_h} duck={want_h} ({got_n} rows)"
            else:
                results[name] = f"OK ({got_n} rows)"
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        finally:
            # progress line per oracle (stderr, flushed): a big-SF run
            # spends minutes inside single DuckDB queries and the
            # buffered final report gives no sign of life
            print(f"[oracle] {name}: {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)

    # queries without oracle: just check rows exist
    for d in sorted(OUT.iterdir()):
        if only is not None and d.name not in only:
            continue
        if d.is_dir() and d.name not in oracle:
            try:
                n = pq.read_table(str(d)).num_rows
                results[d.name] = f"NO-ORACLE rows={n}" + ("" if n else "  <-- EMPTY")
            except Exception as e:
                results[d.name] = f"NO-ORACLE ERROR: {e}"

    if not results:
        print("no results found — did Verify run?")
        sys.exit(1)
    width = max(len(k) for k in results)
    nok = 0
    for k, v in sorted(results.items()):
        ok = v.startswith("OK") or v.startswith("NO-ORACLE rows")
        nok += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {v}")
    print(f"\n{len(results) - nok}/{len(results)} pass")
    sys.exit(1 if nok else 0)


if __name__ == "__main__":
    main()
