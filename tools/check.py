#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet under <outDir>, runs the matching
oracle_sql.json entry in DuckDB (tables = the sf parquet files) and
compares schema + column-sorted, row-sorted values.

DRIVER-EXACT semantics (round-1 lesson): the driver hashes exact
values after sorting columns by name, so dtype differences (DuckDB
sum(BIGINT) -> HUGEINT -> float64 vs Spark int64) are FAILURES even
when values are numerically identical. This gate therefore requires
identical dtypes and exact values — no rtol, no check_dtype=False.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
        # Driver semantics (verified round 1): int WIDTH is canonicalized
        # (int32 rank vs BIGINT passed), int-vs-float is NOT (sum HUGEINT
        # -> float64 failed). So widen all ints to int64, leave floats.
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            import datetime
            first = df[c].dropna().iloc[0] if df[c].notna().any() else None
            if isinstance(first, datetime.date):
                # date objects -> timestamp; anything else (str, Decimal,
                # Python int from HUGEINT) stays object so the dtype
                # check below flags it against Spark's int64/float64.
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
names = sorted(oracle.keys())
extra = sorted(set(os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d))
               - set(names))
def run_one(name):
    """True iff the query passes; any exception inside canon/compare is a
    per-query FAIL, never a gate crash (round-2 advice: a mixed-type
    object column can raise TypeError inside sort_values)."""
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); return False
    try:
        got = canon(pd.read_parquet(pdir))
    except Exception as e:
        print(f"FAIL {name}: cannot read/canon spark output: {str(e)[:160]}"); return False
    try:
        want = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:160]}"); return False
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); return False
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); return False
    dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
              for c in got.columns if got[c].dtype != want[c].dtype]
    if dt_bad:
        print(f"FAIL {name}: dtypes differ (spark vs oracle): {dt_bad}"); return False
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
        print(f"ok   {name} ({len(got)} rows)")
        return True
    except AssertionError as e:
        print(f"FAIL {name}: values differ: {str(e).splitlines()[-1][:200]}")
        try:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  got :", got.loc[i].to_dict())
                print("  want:", want.loc[i].to_dict())
        except Exception:
            pass
        return False

for name in names:
    try:
        ok = run_one(name)
    except Exception as e:
        print(f"FAIL {name}: comparator crashed: {str(e)[:160]}"); ok = False
    if not ok:
        fails += 1
for name in extra:
    print(f"note {name}: spark output without oracle (rows-only check)")
print(f"\n{len(names)-fails}/{len(names)} oracles pass; {len(extra)} rows-only")
sys.exit(1 if fails else 0)
