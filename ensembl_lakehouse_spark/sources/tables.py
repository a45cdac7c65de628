"""Fixture-table loaders (TESTDATA.md tables).

One place that knows the physical quirks of the test lake so the
rest of the engine sees clean typed DataFrames:

- ``events.ts`` has shipped in two physical encodings across
  fixture generations: TIMESTAMP(NANOS) (which Spark's Parquet
  reader rejects — [PARQUET_TYPE_ILLEGAL] — so we read nanos as
  long via the legacy conf and rebuild TIMESTAMP_NTZ with epoch
  arithmetic) and plain TIMESTAMP(MICROS). ``normalize_event_ts``
  dispatches on the *observed* Spark type so both generations load
  to the same TIMESTAMP_NTZ µs column — exactly what DuckDB's
  µs-resolution naive TIMESTAMP sees, so oracle comparisons agree.
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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_NTZ (µs).

    Dispatches on the observed type so every fixture generation
    lands on identical values:

    - ``bigint``  — epoch *nanos* read via the nanosAsLong legacy
      conf; truncate to µs (DuckDB truncates the same way) and
      rebuild NTZ with tz-independent epoch arithmetic.
    - ``timestamp`` (instant) — cast to NTZ; the session timezone
      is pinned to UTC (session.py) so the wall clock is preserved.
    - ``timestamp_ntz`` — already the canonical shape; no-op.
    """
    dt = df.schema[col].dataType.simpleString()
    if dt == "bigint":
        return df.withColumn(
            col,
            F.expr(
                f"timestampadd(MICROSECOND, {col} div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    if dt == "timestamp":
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
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
