#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares: column names (sorted), row count, and values
(rows sorted by all columns, exact match; floats reported with max
abs diff when not identical).
"""
import json, sys, glob, os, warnings
import duckdb
import pandas as pd
import numpy as np
warnings.filterwarnings("ignore")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps/datetimes to ISO strings for comparison
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    # Iterate the EXPECTED key set (manifest written by Verify), so a
    # query that throws before creating its output dir counts as a
    # failure instead of silently disappearing from the gate.
    keys_path = f"{out_dir}/query_keys.json"
    if os.path.exists(keys_path):
        names = sorted(json.load(open(keys_path)))
    else:
        names = sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"rows {name}: {len(spark_df)} rows (no oracle)")
            if len(spark_df) == 0: fails += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
            fails += 1; continue
        dtype_bad = [(c, a[c].dtype, b[c].dtype) for c in a.columns
                     if a[c].dtype != b[c].dtype]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad}")
            fails += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails += 1; continue
        ok = True
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                af = av.astype(float); bf = bv.astype(float)
                nan_ok = np.isnan(af) == np.isnan(bf)
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                if not (nan_ok.all() and eq.all()):
                    d = np.nanmax(np.abs(af - bf))
                    print(f"FAIL {name}.{c}: float mismatch maxabs={d}")
                    ok = False
            else:
                if not (pd.Series(av).astype(object).fillna("\x00") ==
                        pd.Series(bv).astype(object).fillna("\x00")).all():
                    i = int(np.argmax(pd.Series(av).astype(object).fillna("\x00").values !=
                                      pd.Series(bv).astype(object).fillna("\x00").values))
                    print(f"FAIL {name}.{c}: value mismatch at row {i}: "
                          f"spark={av[i]!r} duck={bv[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name}: {len(a)} rows")
        else:
            fails += 1
    print(f"== {len(names)-fails}/{len(names)} pass ==")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
