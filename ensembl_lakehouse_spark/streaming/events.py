"""Structured Streaming over the ``events`` table (SURVEY §2
Streaming EXT).

The reference has no streaming at all (SURVEY §2: "ABSENT"; its
async submit→poll lifecycle at app/main.py:478-485,263-277 is the
closest analog). This module is the promised streaming twin of the
batch ``operators/relational.events_hourly`` plan: same grouping,
same aggregates, expressed as an incremental query with a watermark
so state is bounded.

Design:

- **Source**: ``readStream`` over a parquet directory with an
  explicit schema (streaming sources cannot infer). The fixture's
  TIMESTAMP(NANOS) quirk is handled the same way as the batch
  loader (sources/tables.py): nanos read as long, rebuilt to µs
  TIMESTAMP_NTZ — one shared conversion, so the stream and the
  batch twin agree bit-for-bit.
- **Watermark** bounds state: ``withWatermark("ts", ...)`` lets the
  engine drop window state once event time passes window_end +
  delay — the difference between O(open windows) and O(all time)
  state at 100 TB/day ingest. Late rows beyond the delay are
  dropped (counted against correctness consciously, not silently:
  the delay is a named constant).
- **Sink**: ``availableNow`` trigger + foreachBatch gives exactly
  the batch semantics over the files present — which is what makes
  the stream == batch equivalence *testable* (tests/
  test_streaming.py asserts the outputs match row-for-row).
  A live deployment swaps the trigger for a processing-time one and
  the sink for kafka/delta; the query graph is unchanged.
- countDistinct is not supported by incremental aggregation, so the
  stream reports ``approx_count_distinct`` for users — the
  documented, scale-honest substitute (exact distinct over an
  unbounded stream requires O(users) state per window). The
  equivalence test therefore compares n_events/sum_value exactly
  and n_users within the HLL error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Allowed event-time lateness before window state is finalized.
WATERMARK_DELAY = "2 hours"

#: Raw parquet schema (ts as raw nanos long, see module docstring).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _event_source(spark: SparkSession, events_dir: str, **options: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.parquet(events_dir)
    # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on NTZ), so the stream rebuilds event time as an instant; the
    # session timezone is pinned to UTC (session.py) so the wall-clock
    # fields equal the batch loader's NTZ values.
    return raw.withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP '1970-01-01 00:00:00')"),
    )


def hourly_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation with a watermark —
    the incremental form of ``relational.events_hourly``.

    Output columns mirror the batch twin (hour, event_type,
    n_events, sum_value, n_users) so the two are directly
    comparable; sum_value uses the same DECIMAL(12,2) accumulate →
    DOUBLE pattern for partition-order determinism.
    """
    src = _event_source(spark, events_dir)
    return (
        src.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value", "n_users")
    )


def sliding_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Sliding 2-hour window every 30 minutes — the overlapping-
    window variant (each event contributes to 4 windows; state is
    4× the tumbling case, still bounded by the watermark)."""
    src = _event_source(spark, events_dir)
    return (
        src.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )


def session_stream(spark: SparkSession, events_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge
    into one session (the third window family SURVEY §7 promises).
    Session state merges incrementally and is finalized by the
    watermark; ``F.session_window`` evaluates identically in batch,
    which is how tests/test_streaming.py cross-checks it."""
    src = _event_source(spark, events_dir)
    return (
        src.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_hourly_to_memory(
    spark: SparkSession, events_dir: str, table_name: str = "events_hourly_stream"
) -> DataFrame:
    """Run the hourly stream with the availableNow trigger into an
    in-memory complete-mode sink and return the result DataFrame.
    This is the test/demo harness; production would writeStream to
    delta/kafka with a processing-time trigger."""
    q = (
        hourly_stream(spark, events_dir)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
