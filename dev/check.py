#!/usr/bin/env python3
"""Dev-only oracle parity checker (mirrors the driver's CORRECTNESS gate).

Usage: python3 dev/check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet written by graft.Verify plus outDir/oracle_sql.json,
runs each oracle against DuckDB views over sfDir parquet tables, and compares
schema + sorted rows exactly.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLUMNS spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = norm(spark_df), norm(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                # fillna BEFORE astype: Spark-side nulls arrive as None,
                # DuckDB-side as NaN — stringifying first would compare
                # 'None' vs 'nan' and flag equal nulls as a mismatch
                ok = av.fillna('\0').astype(str).equals(bv.fillna('\0').astype(str))
        except Exception as e:
            return f"COMPARE-ERR col={c}: {e}"
        if not ok:
            # reuse the same mask that made ok False — a string-equality
            # recompute can be all-False for float columns and point at row 0
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                bad = ~((av.isna() & bv.isna()) | (av == bv))
            else:
                bad = ~(av.fillna('\0').astype(str) == bv.fillna('\0').astype(str))
            mism = bad.idxmax()
            return (f"VALUES col={c} first-mismatch row={mism}: "
                    f"spark={a[c][mism]!r} duck={b[c][mism]!r} | sparkrow={a.iloc[mism].to_dict()}")
    return None

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted({p.split('/')[-2] for p in glob.glob(f"{out}/*/_SUCCESS")})
    n_ok = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows"); n_ok += 1
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {str(e)[:300]}")
            continue
        err = cmp(name, spark_df, duck_df)
        if err: print(f"[FAIL] {name}: {err}")
        else: print(f"[ok] {name}: {len(spark_df)} rows"); n_ok += 1
    missing = set(oracles) - set(names)
    if missing: print("oracle-but-no-output:", sorted(missing))
    print(f"{n_ok}/{len(names)} ok")

if __name__ == "__main__":
    main()
