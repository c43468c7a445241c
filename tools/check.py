#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
graft.Verify into OUTDIR/<name>/ (parquet), run the corresponding oracle SQL
from OUTDIR/oracle_sql.json in DuckDB over the parquet tables in SFDIR,
sort columns by name + rows by all columns, and compare values.

Usage: python3 tools/check.py [--parallel N] <sfdir> <outdir> [query ...]

--parallel N splits the query list over N child check.py processes
(strided assignment so alphabetically-adjacent heavy families spread out),
merges their artifacts and per-query lines, and prints the same output
format as a single-process run. The sf0.1 full-registry gate is hours
single-threaded (the minhash-family oracle SQL dominates); round-11 ran it
as ~6 hand-split instances merged by hand — this flag is that procedure.

If the env var CHECK_ARTIFACT is set to a path, a machine-readable artifact in
the driver's exact per-query schema is written there:
  {"<name>": {"rows_match": bool, "schema_match": bool, "hash_match": bool,
              "spark_rows": int, "oracle_rows": int, "err": str|null}, ...}
(rows-only queries get rows_match/spark_rows and err="rows-only".)
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


def parallel_main(nproc, sfdir, outdir, only):
    import subprocess, tempfile
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(oracle)
    for pq in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(pq.rstrip("/"))
        if name not in oracle and glob.glob(f"{pq}/*.parquet"):
            names.append(name)  # rows-only queries
    if only:
        names = [n for n in names if n in only]
    chunks = [names[i::nproc] for i in range(nproc)]
    chunks = [c for c in chunks if c]
    procs, tmps = [], []
    for c in chunks:
        tmp = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
        tmps.append(tmp.name)
        env = dict(os.environ, CHECK_ARTIFACT=tmp.name)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), sfdir, outdir] + c,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True))
    artifact, lines = {}, {}
    for p, tmp in zip(procs, tmps):
        out, _ = p.communicate()
        last = None
        for ln in out.splitlines():
            tok = ln.split()
            if len(tok) >= 2 and tok[0] in ("OK", "MISSING", "ORAFAIL", "SCHEMA",
                                            "ROWCOUNT", "MISMATCH", "ROWSONLY"):
                last = tok[1].rstrip(":")
                lines[last] = ln
            elif ln.startswith("  col=") and last:  # mismatch detail lines
                lines[last] += "\n" + ln
        try:
            artifact.update(json.load(open(tmp)))
        except Exception as e:
            print(f"WORKER   artifact {tmp} unreadable: {e}")
        os.unlink(tmp)
    for name in sorted(lines):
        print(lines[name])
    n_ok = sum(1 for v in artifact.values() if v.get("hash_match"))
    n_bad = sum(1 for v in artifact.values()
                if v.get("err") not in (None, "rows-only"))
    missing = [n for n in names if n not in artifact]
    for n in missing:
        print(f"MISSING  {n}: no worker result")
    n_bad += len(missing)
    art_path = os.environ.get("CHECK_ARTIFACT")
    if art_path:
        with open(art_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"artifact -> {art_path} ({len(artifact)} queries)")
    print(f"\n{n_ok} ok, {n_bad} bad  ({nproc} workers)")
    sys.exit(1 if n_bad else 0)


def main():
    argv = sys.argv[1:]
    nproc = 0
    if argv and argv[0] == "--parallel":
        nproc = int(argv[1])
        argv = argv[2:]
    if nproc > 1:
        parallel_main(nproc, argv[0], argv[1], set(argv[2:]))
        return
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    artifact = {}

    def rec(name, rows_match=False, schema_match=False, hash_match=False,
            spark_rows=0, oracle_rows=0, err=None):
        artifact[name] = {"rows_match": rows_match, "schema_match": schema_match,
                          "hash_match": hash_match, "spark_rows": int(spark_rows),
                          "oracle_rows": int(oracle_rows), "err": err}

    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = f"{outdir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"MISSING  {name}: no spark output")
            rec(name, err="no spark output")
            n_bad += 1
            continue
        try:
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            rec(name, err=f"oracle sql failed: {e}")
            n_bad += 1
            continue
        got = normalize(con.execute(f"SELECT * FROM '{pq}/*.parquet'").df())
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            rec(name, rows_match=len(got) == len(exp), spark_rows=len(got),
                oracle_rows=len(exp), err="schema mismatch")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWCOUNT {name}: spark={len(got)} oracle={len(exp)}")
            rec(name, schema_match=True, spark_rows=len(got), oracle_rows=len(exp),
                err="rowcount mismatch")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
            print(f"OK       {name} ({len(got)} rows)")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(got), oracle_rows=len(exp))
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
            rec(name, rows_match=True, schema_match=True, spark_rows=len(got),
                oracle_rows=len(exp), err="value hash mismatch")
            n_bad += 1
    # rows-only queries (no oracle)
    for pq in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(pq.rstrip("/"))
        if name not in oracle and glob.glob(f"{pq}/*.parquet"):
            n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
            print(f"ROWSONLY {name}: {n} rows")
            if not only or name in only:
                rec(name, rows_match=n > 0, spark_rows=n, err="rows-only")
    art_path = os.environ.get("CHECK_ARTIFACT")
    if art_path:
        with open(art_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"artifact -> {art_path} ({len(artifact)} queries)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
