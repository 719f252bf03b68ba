#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify
output against DuckDB oracles and diff. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output"))
        print(f"MISSING {name}")
        continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        print(f"ORACLE-ERR {name}: {str(e)[:200]}")
        continue
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    # driver-style compare: sort columns by name, sort rows, stringify
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df.astype(str)
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        fails.append((name, f"cols want={list(w.columns)} got={list(g.columns)}"))
        print(f"COLS {name}: want={list(w.columns)} got={list(g.columns)}")
    elif len(w) != len(g):
        fails.append((name, f"rows want={len(w)} got={len(g)}"))
        print(f"ROWS {name}: want={len(w)} got={len(g)}")
    elif not w.equals(g):
        diff = (w != g).any(axis=1)
        idx = diff[diff].index[:5]
        fails.append((name, "values"))
        print(f"VALS {name}: first diffs\nwant:\n{w.loc[idx]}\ngot:\n{g.loc[idx]}")
    else:
        print(f"OK   {name} ({len(w)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} match")
sys.exit(1 if fails else 0)
