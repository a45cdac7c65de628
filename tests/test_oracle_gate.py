"""Regression tests for the typed oracle gate (tools/check_oracle.py).

Round-2 postmortem: the gate's pandas ``==`` compare silently coerced
DuckDB HUGEINT (arrow decimal128(38,0)) equal to Spark int64, so four
queries with uncast integer ``SUM(...)`` in their oracle SQL shipped
green locally and failed the driver's typed hash. These tests pin the
hardened behavior: decimal-vs-int MUST flag, int-width drift MUST NOT
(the driver was green on mixed-width queries in r2).
"""

import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import canonical_type, schema_problems  # noqa: E402


def test_uncast_sum_hugeint_flags():
    """DuckDB SUM(int) returns HUGEINT → decimal128(38,0); Spark returns
    int64. The r2 driver failed this; the gate must fail it locally."""
    duck = duckdb.connect().execute("SELECT SUM(i) AS s FROM range(3) t(i)").arrow().schema
    spark_like = pa.schema([pa.field("s", pa.int64())])
    problems = schema_problems(spark_like, duck)
    assert problems, "uncast SUM must be flagged"
    assert "decimal(38,0)" in problems[0]


def test_cast_sum_bigint_passes():
    duck = duckdb.connect().execute(
        "SELECT CAST(SUM(i) AS BIGINT) AS s FROM range(3) t(i)"
    ).arrow().schema
    spark_like = pa.schema([pa.field("s", pa.int64())])
    assert schema_problems(spark_like, duck) == []


def test_int_width_drift_is_hash_equal():
    """int32 vs int64 hashed equal by the driver in r2 (three green
    queries had mixed widths) — the gate must not cry wolf on it."""
    a = pa.schema([pa.field("x", pa.int32())])
    b = pa.schema([pa.field("x", pa.int64())])
    assert schema_problems(a, b) == []


def test_float_vs_decimal_flags():
    a = pa.schema([pa.field("x", pa.float64())])
    b = pa.schema([pa.field("x", pa.decimal128(38, 2))])
    assert schema_problems(a, b)


def test_string_large_string_equal():
    assert canonical_type(pa.large_string()) == canonical_type(pa.string())


def test_timestamp_unit_kept():
    assert canonical_type(pa.timestamp("us")) == "timestamp[us]"
    assert canonical_type(pa.timestamp("ns")) != canonical_type(pa.timestamp("us"))


def test_list_types_recurse():
    a = pa.schema([pa.field("v", pa.list_(pa.float32()))])
    b = pa.schema([pa.field("v", pa.large_list(pa.float32()))])
    assert schema_problems(a, b) == []
    c = pa.schema([pa.field("v", pa.list_(pa.float64()))])
    assert schema_problems(a, c)
