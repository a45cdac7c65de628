"""Continuous aggregate: a streaming hourly rollup materialized
incrementally via ``foreachBatch`` upserts (EXT; the streaming twin
of operators/maintenance.rollup_incremental).

Division of labor, which is the design point:

- The **state store** does the incremental math. In ``update``
  output mode the windowed aggregation's state holds the full
  (count, sum) per open window; each micro-batch emits only the
  windows it touched, already re-aggregated over everything seen.
- The **sink** therefore does a pure keyed UPSERT (last write wins),
  never arithmetic. A sink that added deltas would double-count on
  micro-batch replay; upsert-by-key is what makes the pipeline
  effectively exactly-once on an at-least-once channel.
- The **watermark** bounds both: window state is dropped once the
  watermark passes (streaming/events.py reasoning), and closed
  windows stop being re-emitted.

At 100 TB/day the sink's upsert target is a keyed table (Delta
MERGE, an RDBMS, a KV store) — |open windows| rows per batch, not
|events|. The in-memory dict used here is the test harness stand-in
with identical semantics (operators/maintenance.py shows the same
merge as a batch full-outer join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.streaming.events import WATERMARK_DELAY, _event_source


def hourly_rollup_updates(
    spark: SparkSession, events_dir: str, **source_options: str
) -> DataFrame:
    """The update-mode streaming aggregation: per (hour, event_type)
    running (n_events, sum_value) — decimal-accumulated like the
    batch twin so merged results compare exactly."""
    src = _event_source(spark, events_dir, **source_options)
    return (
        src.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )


def run_continuous_rollup(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
    view: dict | None = None,
) -> tuple[dict, int, int]:
    """Drive the continuous rollup with availableNow and a
    foreachBatch upsert sink; returns (materialized_view, n_batches,
    n_input_rows).

    ``max_files_per_trigger=1`` forces one micro-batch per source
    file, so a multi-file directory genuinely exercises incremental
    updates (later batches overwrite earlier keys with re-aggregated
    values) rather than collapsing into one batch.

    ``checkpoint_dir`` + a carried-over ``view`` dict model the
    RESTART path: the source offsets, watermark, and window state
    all live in the checkpoint, so a second availableNow run on the
    same checkpoint ingests ONLY files that arrived since the last
    run and keeps upserting the same materialized view —
    effectively-exactly-once across process restarts
    (tests/test_streaming.py asserts both the no-reprocessing and
    the final-equality halves of that claim).
    """
    view = {} if view is None else view
    batches = {"n": 0}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batches["n"] += 1
        for r in batch_df.collect():
            view[(r.hour, r.event_type)] = (r.n_events, r.sum_value)

    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger is not None
        else {}
    )
    writer = (
        hourly_rollup_updates(spark, events_dir, **opts)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    n_input = sum(int(p["numInputRows"]) for p in q.recentProgress)
    return view, batches["n"], n_input
