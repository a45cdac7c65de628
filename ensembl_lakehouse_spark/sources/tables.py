"""Fixture-table loaders (TESTDATA.md tables).

One place that knows the physical quirks of the test lake so the
rest of the engine sees clean typed DataFrames:

- ``events.parquet`` stores TIMESTAMP(NANOS) which Spark's Parquet
  reader rejects ([PARQUET_TYPE_ILLEGAL]); we read nanos as long
  (legacy conf) and rebuild a TIMESTAMP_NTZ at microsecond
  precision — exactly what DuckDB's µs-resolution TIMESTAMP sees, so
  oracle comparisons agree. The conversion is tz-independent
  (epoch arithmetic on NTZ, no session-timezone cast).
- Everything else reads natively; ms-timestamps arrive as
  TIMESTAMP_NTZ which matches DuckDB's naive TIMESTAMP semantics.

Scale note: these are plain ``spark.read.parquet`` scans — column
pruning and predicate pushdown apply. At 100 TB the same loader
would point at a partitioned/bucketed lake layout (see
catalog.DEFAULT_KEY_COLUMN for the partition keys) or Delta tables;
the API is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # TIMESTAMP(NANOS) → read as long → truncate to µs (DuckDB
        # does the same truncation) → NTZ via epoch arithmetic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
