"""Local emulation of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf_dir AND its oracle_sql()
through DuckDB, then compare row count, sorted column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from tfidf_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
                exact = bad.sum()
                close_bad = (~np.isclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True)).sum()
                if exact:
                    problems.append(
                        f"col {c}: {exact} rows differ bitwise"
                        f" ({close_bad} beyond 1e-12);"
                        f" first: {av[bad][:3]} vs {bv[bad][:3]}"
                    )
            else:
                bad = av != bv
                if bad.any():
                    problems.append(
                        f"col {c}: {bad.sum()} rows differ; first: "
                        f"{av[bad][:3]} vs {bv[bad][:3]}"
                    )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            fail += 1
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows, {len(spark_pdf.columns)} cols")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
