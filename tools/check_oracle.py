#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [sfdir] [verify_outdir] [only]

Reads each <outdir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over the sfdir
parquet tables, sorts columns by name and rows by value, and reports
row/schema/value match per query.

Optional 3rd arg `only`: a comma-separated name list, or a path to a file
with one query name per line — restricts the sweep to those rows (resume
support for the multi-hour sf1 gate).

Oracle-result cache (VERDICT r17 #7): the quadratic ground-truth oracles
(x20/x65/x3 ~29 min each at sf1) recompute identical small result sets
every sweep over an identical fixture tree. With ORACLE_CACHE_DIR set,
each oracle result is materialized once to parquet, keyed on
sha256(name + oracle SQL + fixture-tree fingerprint) where the
fingerprint covers every table parquet's (name, size, mtime_ns) — so
GenScaleTree regeneration invalidates it. A cache entry is kept only if
the parquet round-trip reproduces the direct result's values AND pandas
dtypes exactly (DuckDB's HUGEINT does not round-trip parquet losslessly;
such rows are verified-then-discarded rather than cached wrong).
"""
import hashlib
import json
import math
import os
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


def fixture_fingerprint(sfdir):
    parts = []
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        except FileNotFoundError:
            parts.append(f"{t}:absent")
    return "|".join(parts)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = None
    if len(sys.argv) > 3:
        arg = sys.argv[3]
        if os.path.isfile(arg):
            only = {l.strip() for l in open(arg) if l.strip()}
        else:
            only = set(arg.split(","))
    cache_dir = os.environ.get("ORACLE_CACHE_DIR")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        # a run killed mid-COPY leaves <key>.parquet.<pid>.tmp behind;
        # sweep them at startup. OWNER-SCOPED (r19 ADVICE): the name
        # embeds the writing pid, so a tmp is reaped exactly when its
        # owner is dead — a concurrent shard's in-flight COPY is safe no
        # matter how long it runs. Legacy un-scoped *.tmp (no pid in the
        # name) keep the old 600s age gate.
        import re as _re
        import time as _time

        def _owner_dead(name):
            m = _re.search(r"\.(\d+)\.tmp$", name)
            if not m:
                return None  # legacy name: no owner recorded
            try:
                os.kill(int(m.group(1)), 0)
                return False  # alive (ours or another user's shard)
            except ProcessLookupError:
                return True
            except PermissionError:
                return False  # alive under another uid
            except OSError:
                return None
        for stale in os.listdir(cache_dir):
            if stale.endswith(".tmp"):
                p = os.path.join(cache_dir, stale)
                dead = _owner_dead(stale)
                try:
                    if dead is True or (
                            dead is None and
                            _time.time() - os.path.getmtime(p) > 600):
                        os.remove(p)
                except OSError:
                    pass
    # the key includes the duckdb version: an engine upgrade can change a
    # result's dtypes (HUGEINT/BIGINT inference), and a cache entry
    # verified under the old engine must not keep serving as the 'want'
    fp = fixture_fingerprint(sfdir) + "|duckdb=" + duckdb.__version__
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import glob
    import time
    for name in sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/*") if not x.endswith(".json")):
        if only is not None and name not in only:
            continue
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
        cache_file = None
        cache_hit = False
        if cache_dir:
            key = hashlib.sha256(
                (name + "\x00" + oracle[name] + "\x00" + fp).encode()).hexdigest()
            cache_file = f"{cache_dir}/{key}.parquet"
            cache_hit = os.path.isfile(cache_file)
        try:
            if cache_hit:
                con.execute(
                    f"CREATE OR REPLACE TEMP TABLE _want AS SELECT * FROM read_parquet('{cache_file}')")
            else:
                con.execute(f"CREATE OR REPLACE TEMP TABLE _want AS {oracle[name]}")
            want_src = "SELECT * FROM _want"
        except duckdb.Error as e:
            print(f"  {name}: temp-table materialization failed ({e}); direct-relation fallback")
            want_src = oracle[name]
            cache_file = None
        if cache_file and not cache_hit and want_src == "SELECT * FROM _want":
            # Write-then-verify: keep the entry only if the parquet
            # round-trip is value- and dtype-lossless vs the live result.
            # owner-scoped: the pid in the name is what the startup
            # sweep keys liveness on (see _owner_dead above)
            tmp = f"{cache_file}.{os.getpid()}.tmp"
            try:
                con.execute(f"COPY _want TO '{tmp}' (FORMAT PARQUET)")
                direct_rows = con.sql("SELECT * FROM _want").fetchall()
                direct_dt = {c: str(t) for c, t in con.sql("SELECT * FROM _want").df().dtypes.items()}
                rt_rel = con.sql(f"SELECT * FROM read_parquet('{tmp}')")
                rt_rows = rt_rel.fetchall()
                rt_dt = {c: str(t) for c, t in con.sql(f"SELECT * FROM read_parquet('{tmp}')").df().dtypes.items()}
                if rt_rows == direct_rows and rt_dt == direct_dt:
                    os.replace(tmp, cache_file)
                else:
                    os.remove(tmp)
                    print(f"  {name}: cache skipped (parquet round-trip not lossless)")
            except Exception as e:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                print(f"  {name}: cache write failed ({e}); continuing uncached")
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
