#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [sfdir] [verify_outdir]

Reads each <outdir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over the sfdir
parquet tables, sorts columns by name and rows by value, and reports
row/schema/value match per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


def values_match(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if not (x == y or math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)):
                    return False
            elif x != y:
                return False
    return True


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import glob
    import time
    for name in sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/*") if not x.endswith(".json")):
        t0 = time.time()
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got_rows, got_cols = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got_rows)} rows)")
            continue
        # Materialize the oracle ONCE: a duckdb relation re-executes per
        # fetch method, so fetchall() + .df() below would run the most
        # expensive oracles (x18's LSH replay + recursive CTE) twice. A
        # temp table preserves the result schema (HUGEINT stays HUGEINT),
        # so the pandas dtype check is unchanged.
        # ADVICE (r8, low): the temp-table path is stricter than executing
        # the relation — an oracle yielding duplicate column names, or one
        # that is not a single SELECT, raises here. Fall back to the direct
        # relation for that query (paying its double execution) instead of
        # crashing the whole ledger.
        try:
            con.execute(f"CREATE OR REPLACE TEMP TABLE _want AS {oracle[name]}")
            want_src = "SELECT * FROM _want"
        except duckdb.Error as e:
            print(f"  {name}: temp-table materialization failed ({e}); direct-relation fallback")
            want_src = oracle[name]
        want_rel = con.sql(want_src)
        want_rows, want_cols = canon(want_rel.fetchall(), want_rel.columns)
        schema_ok = got_cols == want_cols
        rows_ok = len(got_rows) == len(want_rows)
        val_ok = rows_ok and values_match(got_rows, want_rows)
        # The driver compares through pandas, where e.g. DuckDB HUGEINT
        # becomes float64 and hash-mismatches an engine bigint even when
        # fetchall() values are equal (the r5 x41/x42 failure). Compare
        # .df() dtypes too, so this replica is no weaker than the driver.
        got_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        want_df = con.sql(want_src).df()
        got_dt = {c: str(t) for c, t in got_df.dtypes.items()}
        want_dt = {c: str(t) for c, t in want_df.dtypes.items()}
        dtype_ok = got_dt == want_dt
        # The driver canonicalizes via pandas sort_values over ALL columns;
        # nested (array-of-struct) columns raise TypeError there — the r11
        # q44 red this replica's tuple-sort missed. Reproduce that exact
        # step so a harness-unsortable output shape fails HERE first.
        try:
            got_df.sort_values(by=sorted(got_df.columns))
            want_df.sort_values(by=sorted(want_df.columns))
        except TypeError as e:
            dtype_ok = False
            print(f"  {name}: PANDAS-UNSORTABLE output ({e})")
        if not dtype_ok:
            print(f"  {name}: DTYPE MISMATCH " +
                  str({c: (got_dt.get(c), want_dt.get(c))
                       for c in set(got_dt) | set(want_dt) if got_dt.get(c) != want_dt.get(c)}))
        status = "OK" if (schema_ok and val_ok and dtype_ok) else "MISMATCH"
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
            print(f"  {name}: {status} schema_ok={schema_ok} rows {len(got_rows)}/{len(want_rows)} values_ok={val_ok}")
            if not schema_ok:
                print(f"    got cols:  {got_cols}\n    want cols: {want_cols}")
            if rows_ok and not val_ok:
                for ra, rb in zip(got_rows, want_rows):
                    if ra != rb:
                        print(f"    first diff:\n      got:  {ra}\n      want: {rb}")
                        break
            elif not rows_ok:
                print(f"    got head:  {got_rows[:2]}\n    want head: {want_rows[:2]}")
        if status == "OK":
            print(f"  {name}: OK ({len(got_rows)} rows, {time.time() - t0:.1f}s)", flush=True)
    print(f"== {n_ok} ok, {n_bad} mismatch ==")


if __name__ == "__main__":
    main()
