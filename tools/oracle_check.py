"""Local replica of the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle at a given sf and
diff row count / column names / values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: "nan" if v is None or (isinstance(v, float)
                and math.isnan(v)) else repr(round(float(v), 9)))
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("oracle-check").getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in os_:
            print(f"ok?  {name}: rows={len(got)} (no oracle — rows-only) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            want = con.sql(os_[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        g, w = canon(got), canon(want)
        status = None
        if list(g.columns) != list(w.columns):
            status = f"columns differ: spark={list(g.columns)} oracle={list(w.columns)}"
        elif len(g) != len(w):
            status = f"rowcount differ: spark={len(g)} oracle={len(w)}"
        elif not g.equals(w):
            neq = (g != w).any(axis=1)
            idx = list(g.index[neq])[:3]
            status = (f"values differ on {int(neq.sum())} rows; first: "
                      f"spark={g.loc[idx].to_dict('records')} "
                      f"oracle={w.loc[idx].to_dict('records')}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"PASS {name}: rows={len(g)} [{time.time() - t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
