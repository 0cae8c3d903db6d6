#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each parquet result written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same testdata tables,
then compares: schema (column names), row count, and a hash of the
value matrix with columns sorted by name and rows sorted by all columns.

Usage: verify_local.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) is not None else df[c]
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            # HASH-FAITHFUL float compare: the driver hashes the raw bytes
            # of each value, so -0.0 vs +0.0 and last-ulp differences are
            # driver failures and must fail here too. The old gate used
            # pandas value-equality after round(9), which treats
            # -0.0 == 0.0 and masks last-ulp diffs — that blind spot let
            # embed_covariance ship driver-red for two rounds. Compare the
            # IEEE-754 bit pattern instead (sorting by the uint view is
            # consistent across both sides, which is all equality needs).
            df[c] = df[c].to_numpy(dtype=np.float64).view(np.uint64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except Exception:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name_dir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(name_dir)
        if not os.path.isdir(name_dir):
            continue
        files = glob.glob(os.path.join(name_dir, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pq.read_table(name_dir).to_pandas()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
        else:
            eq = g.equals(e)
            if not eq:
                # find first differing cell for debugging
                diff = (g != e) & ~(g.isna() & e.isna())
                cells = list(zip(*diff.to_numpy().nonzero()))[:3]
                detail = [(int(r), g.columns[c], g.iat[r, c], e.iat[r, c]) for r, c in cells]
                results[name] = f"VALUE_MISMATCH {detail}"
            else:
                results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {n_ok}/{len([k for k in results if k in oracle])} oracle-checked OK, "
          f"{len(results)} total")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
