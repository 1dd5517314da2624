#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB on
oracle_sql.json over the sf parquet tables and compare row/schema/hash
against the Spark-written parquet from graft.Verify."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    spath = f"{out_dir}/{name}"
    if not glob.glob(f"{spath}/*.parquet"):
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        d = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {e}"))
        continue
    s = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{spath}/*.parquet')").df()
    if sorted(d.columns) != sorted(s.columns):
        bad.append((name, f"SCHEMA: oracle={sorted(d.columns)} spark={sorted(s.columns)}"))
        continue
    if len(d) != len(s):
        bad.append((name, f"ROWS: oracle={len(d)} spark={len(s)}"))
        continue
    dc, sc = canon(d), canon(s)
    # Driver hashes are dtype-sensitive: an int64 Spark column vs a
    # float64 oracle column (DuckDB HUGEINT sums) hash-mismatches even
    # when every value compares equal — so dtype inequality is a FAIL.
    dtype_diffs = [f"{c}: oracle={dc[c].dtype} spark={sc[c].dtype}"
                   for c in dc.columns if dc[c].dtype != sc[c].dtype]
    if dtype_diffs:
        bad.append((name, "DTYPES: " + "; ".join(dtype_diffs)))
        continue
    try:
        eq = dc.equals(sc)
        if not eq:
            eq = all((dc[c].values == sc[c].values).all() for c in dc.columns)
    except Exception as e:
        eq = False
    if eq:
        ok.append((name, len(d)))
    else:
        diffs = []
        for c in dc.columns:
            try:
                neq = (dc[c].values != sc[c].values)
                if neq.any():
                    i = int(neq.argmax())
                    diffs.append(f"{c}[{i}]: oracle={dc[c].iloc[i]!r} spark={sc[c].iloc[i]!r}")
            except Exception as e:
                diffs.append(f"{c}: {e}")
        bad.append((name, "VALUES: " + "; ".join(diffs[:4])))

for n, r in ok:
    print(f"PASS {n} ({r} rows)")
for n, msg in bad:
    print(f"FAIL {n}: {msg}")
# queries without oracle
qdirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
for n in sorted(qdirs - set(oracle)):
    nrows = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/{n}/*.parquet')").fetchone()[0]
    print(f"ROWS-ONLY {n}: {nrows} rows")
print(f"\n{len(ok)} pass / {len(bad)} fail / {len(oracle)} oracled")
sys.exit(1 if bad else 0)
