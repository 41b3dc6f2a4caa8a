#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
  1. (caller) run graft.Verify to produce <outDir>/<name>/ parquet + oracle_sql.json
  2. this script registers the sf tables in DuckDB, runs each oracle SQL,
     and compares to the Spark result: sorted columns, sorted rows,
     rounded floats, then hash.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = res_dir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = normalize(spark_df), normalize(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} oracle={len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1).idxmax()
            results[name] = (f"VALUE_MISMATCH cols={bad_cols} first_row={idx} "
                             f"spark={a.loc[idx, bad_cols].to_dict()} "
                             f"oracle={b.loc[idx, bad_cols].to_dict()}")
        else:
            results[name] = f"OK({len(a)})"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "ROWS_ONLY")) else "!!"
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
