#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads <out>/oracle_sql.json + <out>/<name>/ parquet dirs (written by
graft.Verify), runs each oracle SQL in DuckDB over the same sf tables,
sorts columns by name and rows by all columns, and diffs.
"""
import sys, json, glob
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Bound DuckDB's memory and give it a spill directory: at sf10 an oracle
# with a wide window/join intermediate (t15's 300M-gram winnowing CTE on
# the skew corpus) otherwise grows the process past physical RAM and the
# kernel OOM-kills the whole gate (exit 137) instead of spilling.
# preserve_insertion_order=false lets the big EXCEPT ALL compares stream.
import os
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET preserve_insertion_order=false")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# ONLY=a,b,c (env) restricts the run — resume a long campaign gate after
# a straggler/OOM without re-checking the queries that already passed.
only = set(os.environ.get("ONLY", "").split(",")) - {""}
n_pass = n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # Big-output fast path (sf1/sf10 campaigns): the pandas
        # sort-and-compare below is exact but loads+sorts both sides in
        # one process — 240M-row outputs (e4 at sf10) take tens of
        # minutes. Above the threshold, do the same exact multiset
        # compare inside DuckDB: column-name sets must match, row counts
        # must match, and (got EXCEPT ALL exp) ∪ (exp EXCEPT ALL got)
        # must be empty — set-op semantics treat NaN=NaN like the pandas
        # isna&isna clause, and differing integer widths unify like the
        # astype(object) compare. The driver's own gate runs at sf0.01
        # where every output takes the pandas path unchanged.
        import pyarrow.parquet as _pq
        n_rows_out = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
        if n_rows_out > 5_000_000:
            con.execute(f"CREATE OR REPLACE VIEW __got AS "
                        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            con.execute(f"CREATE OR REPLACE TEMP TABLE __exp AS {sql}")
            g_cols = sorted(r[0] for r in con.execute("DESCRIBE __got").fetchall())
            e_cols = sorted(r[0] for r in con.execute("DESCRIBE __exp").fetchall())
            if g_cols != e_cols:
                print(f"FAIL {name}: columns differ spark={g_cols} duckdb={e_cols}")
                n_fail += 1
                continue
            ng = con.execute("SELECT count(*) FROM __got").fetchone()[0]
            ne = con.execute("SELECT count(*) FROM __exp").fetchone()[0]
            if ng != ne:
                print(f"FAIL {name}: rows spark={ng} duckdb={ne}")
                n_fail += 1
                continue
            cl = ", ".join(f'"{c}"' for c in g_cols)
            n_diff = con.execute(
                f"SELECT count(*) FROM ("
                f"(SELECT {cl} FROM __got EXCEPT ALL SELECT {cl} FROM __exp)"
                f" UNION ALL "
                f"(SELECT {cl} FROM __exp EXCEPT ALL SELECT {cl} FROM __got)) t"
            ).fetchone()[0]
            con.execute("DROP TABLE __exp")
            if n_diff:
                print(f"FAIL {name}: {n_diff} multiset-diff rows (duckdb fast path)")
                n_fail += 1
            else:
                print(f"PASS {name} ({ng} rows)")
                n_pass += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).df()
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns differ spark={g_cols} duckdb={e_cols}")
            n_fail += 1
            continue
        got, exp = got[g_cols], exp[g_cols]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        # NOTE: deliberately NO canonicalization of array cells here — the
        # external driver's compare chokes on them (r7: s10/t21), so this
        # replica must too; Verify.scala now rejects non-scalar columns in
        # oracle-checked outputs before they ever reach a compare.
        got = got.sort_values(g_cols).reset_index(drop=True)
        exp = exp.sort_values(g_cols).reset_index(drop=True)
        # normalize dtypes for compare (duckdb may give int32/category etc.)
        mismatch = None
        for c in g_cols:
            a, b = got[c], exp[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    ok = ((a.isna() & b.isna()) | (a.astype(object) == b.astype(object))).all()
            except Exception as ex:
                ok = False
            if not ok:
                diff = (~((a.isna() & b.isna()) | (a.astype(object) == b.astype(object)))).idxmax()
                mismatch = f"col {c} first-diff row {diff}: spark={a[diff]!r} duckdb={b[diff]!r} (dtypes {a.dtype}/{b.dtype})"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: exception {type(e).__name__}: {e}")
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
