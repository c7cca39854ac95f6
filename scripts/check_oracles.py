"""Local stand-in for the driver's correctness gate: run every queries()
entry AND its oracle_sql() twin at a given sf dir, compare row count,
column names, and sorted values. Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from text_ocr_spark.pipeline import session_builder

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = session_builder(master="local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    oracles = e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name:28s} NO-ORACLE (rows-only)")
            continue
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.sql(oracles[name]).df()
        s, o = norm(sdf), norm(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_cols and s.equals(o)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status}  rows={len(s)}/{len(o)} cols_match={ok_cols}"
            f" vals_match={ok_vals}"
        )
        if status == "FAIL":
            failed.append(name)
            if ok_cols and ok_rows:
                neq = (s != o) & ~(s.isna() & o.isna())
                bad = neq.any(axis=1)
                print(s[bad].head(3))
                print(o[bad].head(3))
            else:
                print(" spark cols:", list(s.columns))
                print(" oracle cols:", list(o.columns))
    print("FAILED:", failed or "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
