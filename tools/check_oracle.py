#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry via Spark AND its
``oracle_sql()`` SQL via DuckDB on the same parquet tables, then
compares row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[col] = s.map(
                lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v
            )
    cols = sorted(out.columns)
    out = out[cols]
    return out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for col in a.columns:
            sa, sb = a[col], b[col]
            if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
                exact = ((sa == sb) | (sa.isna() & sb.isna())).all()
                if not exact:
                    close = all(
                        (math.isnan(x) and math.isnan(y)) or x == y or
                        math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                        for x, y in zip(sa.fillna(float("nan")), sb.fillna(float("nan")))
                    )
                    tag = "CLOSE-BUT-NOT-EXACT" if close else "DIFFERENT"
                    bad = (sa != sb) & ~(sa.isna() & sb.isna())
                    idx = bad.idxmax()
                    problems.append(
                        f"float col {col}: {tag} e.g. row {idx}: spark={sa[idx]!r} duck={sb[idx]!r}"
                    )
            else:
                eq = (sa == sb) | (sa.isna() & sb.isna())
                if not eq.all():
                    idx = (~eq).idxmax()
                    problems.append(f"col {col}: differs e.g. row {idx}: spark={sa[idx]!r} duck={sb[idx]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:]) if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )

    import __spark_entry__ as entry
    from ensembl_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb_conn(sf_dir)
    queries, oracles = entry.queries(), entry.oracle_sql()

    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if sql is None:
            print(f"skip  {name}: no oracle (rows={len(spark_pdf)})")
            continue
        try:
            duck_pdf = con.execute(sql).fetchdf()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows)")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
