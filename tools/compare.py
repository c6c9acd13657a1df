#!/usr/bin/env python3
"""Replicate the driver's DuckDB oracle compare over a graft.Verify dump.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

For each query with an entry in oracle_sql.json: register each
<sfDir>/*.parquet as a view named after the table, run the oracle SQL, load
the Spark parquet result, sort columns by name, round floats to 4 decimals,
sort rows, and compare row count / schema / value hash.
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(4)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"{name}: MISSING spark output"); fails += 1; continue
        try:
            sp = pd.concat([pd.read_parquet(f) for f in sorted(
                glob.glob(os.path.join(spark_path, "*.parquet")))], ignore_index=True)
            oc = con.sql(oracles[name]).df()
            sp_c, oc_c = canon(sp), canon(oc)
            rows = len(sp_c) == len(oc_c)
            schema = list(sp_c.columns) == list(oc_c.columns)
            if rows and schema:
                same = True
                for c in sp_c.columns:
                    a, b = sp_c[c], oc_c[c]
                    if a.dtype == np.float64:
                        same = same and np.allclose(a.fillna(-1e300), b.astype(np.float64).fillna(-1e300), atol=1e-9)
                    else:
                        same = same and (a.astype(str).values == b.astype(str).values).all()
            else:
                same = False
            status = "OK" if (rows and schema and same) else "FAIL"
            if status == "FAIL":
                fails += 1
                print(f"{name}: {status} rows={len(sp_c)}/{len(oc_c)} "
                      f"schema={list(sp_c.columns)} vs {list(oc_c.columns)}")
                if rows and schema:
                    for c in sp_c.columns:
                        a, b = sp_c[c], oc_c[c]
                        if not (a.astype(str).values == b.astype(str).values).all():
                            bad = (a.astype(str).values != b.astype(str).values)
                            i = int(np.argmax(bad))
                            print(f"  first diff col={c} row={i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
                            break
            else:
                print(f"{name}: OK ({len(sp_c)} rows)")
        except Exception as e:
            fails += 1
            print(f"{name}: ERR {type(e).__name__}: {e}")
    sys.exit(1 if fails else 0)

main()
