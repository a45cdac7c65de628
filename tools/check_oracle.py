#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry via Spark AND its
``oracle_sql()`` SQL via DuckDB on the same parquet tables, then
compares row count, column names, ARROW-LEVEL COLUMN TYPES, and
order-insensitive values.

The typed (arrow schema) comparison is the r2 hardening: the driver
hashes *typed* values, so DuckDB returning HUGEINT (decimal128) where
Spark returns int64 fails the driver even when every value is equal.
Pandas ``==`` silently coerces those equal, which is how r2 shipped 4
red rows past this gate. Both sides are now fetched as Arrow tables
and their canonicalized field types must match exactly.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

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


def canonical_type(t: pa.DataType) -> str:
    """Collapse arrow type aliases that the driver's hash treats as equal,
    keep everything else exact.

    Calibrated against driver behavior observed across rounds 1-2:
    int32 vs int64 hash EQUAL (scalar_functions_dialect, sample_weighted,
    quota_per_group were driver-green in r2 with mixed int widths), but
    decimal128(38,0) vs int64 hash DIFFERENT (the four r2 red rows).
    That is exactly ``pandas.util.hash_pandas_object`` semantics: every
    numpy int width hashes via the same uint64 view, while DuckDB HUGEINT
    arrives as object-dtype ``Decimal`` and hashes by object. So: all int
    widths collapse to "int"; decimal stays its own type."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canonical_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        # tz is dropped: the session TZ is pinned UTC, so a Spark
        # instant (tz=UTC) and a DuckDB naive timestamp hold the same
        # i8 micros and hash equal (events_daily_from_hourly was
        # driver-green in r2 with exactly that pairing).
        return f"timestamp[{t.unit}]"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


def nested_output_problems(schema: pa.Schema, side: str) -> list[str]:
    """Flag any non-scalar (list/map/struct) output column.

    The driver's canonicalizer sorts a pandas frame over ALL columns;
    a list cell is unhashable and crashes it before any value
    comparison happens — this produced r4's only red row
    (``inverted_postings``) even though the arrow-typed value compare
    passed. Nothing downstream can hash these, so the gate now fails
    them outright: serialize to a scalar (``array_join`` /
    ``array_to_string``) before projecting."""
    problems = []
    for f in schema:
        t = f.type
        if (
            pa.types.is_list(t)
            or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)
            or pa.types.is_map(t)
            or pa.types.is_struct(t)
        ):
            problems.append(
                f"NON-SCALAR {side} col {f.name}: {t} — driver canonicalizer "
                f"cannot hash it; array_join/array_to_string to a string"
            )
    return problems


def schema_problems(spark_schema: pa.Schema, duck_schema: pa.Schema) -> list[str]:
    problems = []
    s = {f.name: canonical_type(f.type) for f in spark_schema}
    d = {f.name: canonical_type(f.type) for f in duck_schema}
    for name in sorted(set(s) & set(d)):
        if s[name] != d[name]:
            problems.append(f"TYPE col {name}: spark={s[name]} duck={d[name]}")
    return problems


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
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
            spark_tbl = sdf.toArrow()
            spark_pdf = spark_tbl.to_pandas()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        nested = nested_output_problems(spark_tbl.schema, "spark")
        if nested:
            failed.append(name)
            print(f"FAIL  {name} ({len(spark_pdf)} rows):")
            for p in nested:
                print(f"      {p}")
            continue
        if sql is None:
            print(f"skip  {name}: no oracle (rows={len(spark_pdf)})")
            continue
        try:
            duck_tbl = con.execute(sql).arrow()
            duck_pdf = duck_tbl.to_pandas()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = nested_output_problems(duck_tbl.schema, "duck")
        problems += schema_problems(spark_tbl.schema, duck_tbl.schema)
        problems += compare(name, spark_pdf, duck_pdf)
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
