#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
graft.Verify into OUTDIR/<name>/ (parquet), run the corresponding oracle SQL
from OUTDIR/oracle_sql.json in DuckDB over the parquet tables in SFDIR,
sort columns by name + rows by all columns, and compare values.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        # unify int widths
        if str(df[c].dtype) in ("int32", "uint32", "int16", "int8"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = f"{outdir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_bad += 1
            continue
        got = normalize(con.execute(f"SELECT * FROM '{pq}/*.parquet'").df())
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWCOUNT {name}: spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
            print(f"OK       {name} ({len(got)} rows)")
            n_ok += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"MISMATCH {name}: {' | '.join(msg[:3])}")
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  col={c} row={idx} spark={got[c][idx]!r} oracle={exp[c][idx]!r} "
                      f"dtypes {got[c].dtype}/{exp[c].dtype}")
            n_bad += 1
    # rows-only queries (no oracle)
    for pq in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(pq.rstrip("/"))
        if name not in oracle and glob.glob(f"{pq}/*.parquet"):
            n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
            print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
