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
|events|. Two sinks are provided:

- ``run_continuous_rollup``: in-memory dict view — the bounded test
  harness stand-in (|hours|x|event_types| keys by construction).
- ``run_continuous_rollup_table``: a durable parquet-table sink with
  MERGE semantics via *append + latest-wins read*: each batch appends
  its update rows stamped with ``batch_id``; the view resolves each
  key to the row from the highest batch. Appends are new-files-only
  (no read-modify-write hazard on an object store), and a replayed
  batch re-appends identical rows under the same batch_id, so replay
  is idempotent at read time — the same reasoning Delta's MERGE gives
  you transactionally. ``compact_rollup_table`` folds the log back to
  one row per key, exactly the OPTIMIZE step a production table runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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
        # Bounded by construction: |hours| x |event_types| keys — the
        # production form of this sink is run_continuous_rollup_table/
        # _snapshots. The cap turns a silently unbounded driver
        # collect (if a caller ever points this demo sink at a
        # non-rollup stream) into a loud error instead of an OOM.
        rows = batch_df.limit(_DICT_SINK_CAP + 1).collect()
        if len(rows) > _DICT_SINK_CAP:
            raise RuntimeError(
                f"dict-sink batch exceeds {_DICT_SINK_CAP} rows — this "
                "demo sink is for bounded rollups; use "
                "run_continuous_rollup_snapshots for real volumes"
            )
        for r in rows:
            view[(r.hour, r.event_type)] = (r.n_events, r.sum_value)

    n_batches, n_input = _drive(
        spark, events_dir, upsert, max_files_per_trigger, checkpoint_dir
    )
    batches["n"] = n_batches
    return view, batches["n"], n_input


def _drive(
    spark: SparkSession,
    events_dir: str,
    sink,
    max_files_per_trigger: int | None,
    checkpoint_dir: str | None,
) -> tuple[int, int]:
    """Run the update-mode rollup with ``availableNow`` into the given
    foreachBatch sink; returns (n_batches, n_input_rows).

    Input rows are summed from the query's progress buffer, whose
    retention defaults to 100 entries — an availableNow run with
    ``maxFilesPerTrigger=1`` over >100 files would silently
    undercount, so the buffer is sized to cover every micro-batch of
    this run before the query starts."""
    batches = {"n": 0}

    def counted(batch_df: DataFrame, batch_id: int) -> None:
        batches["n"] += 1
        sink(batch_df, batch_id)

    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger is not None
        else {}
    )
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    writer = (
        hourly_rollup_updates(spark, events_dir, **opts)
        .writeStream.outputMode("update")
        .foreachBatch(counted)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    n_input = sum(int(p["numInputRows"]) for p in q.recentProgress)
    return batches["n"], n_input


# ---------------------------------------------------------------------------
# Durable table sink (the production form of the dict view)
# ---------------------------------------------------------------------------

ROLLUP_KEYS = ("hour", "event_type")

#: Safety bound for the in-memory dict demo sink (run_continuous_rollup).
_DICT_SINK_CAP = 100_000


def run_continuous_rollup_table(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[int, int]:
    """Continuous rollup into a durable parquet table with MERGE
    semantics; returns (n_batches, n_input_rows).

    The sink APPENDS each update batch stamped with its ``batch_id``
    instead of rewriting the table: append is new-files-only (safe on
    object stores, no read-while-overwrite), and the reader
    (``rollup_table_view``) resolves each (hour, event_type) to its
    highest-batch row — last-write-wins, i.e. MERGE at read time.
    A replayed micro-batch after a crash re-appends byte-identical
    rows under the same batch_id, so the view is unchanged:
    effectively-exactly-once without a transaction log. On a Delta/
    Iceberg deployment the same foreachBatch body becomes
    ``MERGE INTO rollup USING batch ON keys WHEN MATCHED UPDATE ...``
    and the read-time resolution disappears."""

    def append_updates(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(table_dir)
        )

    return _drive(spark, events_dir, append_updates, max_files_per_trigger, checkpoint_dir)


def rollup_table_view(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current state of the rollup table: latest row per key.

    One window over the append log — at scale the log stays shallow
    because ``compact_rollup_table`` folds it (and the watermark stops
    closed windows from being re-emitted, so only recent hours ever
    accumulate versions)."""
    log = spark.read.parquet(table_dir)
    w = Window.partitionBy(*ROLLUP_KEYS).orderBy(F.col("batch_id").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )


def run_continuous_rollup_snapshots(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[int, int]:
    """Continuous rollup committing each micro-batch as a REAL MERGE
    into a snapshot-versioned table (snapshots.py); returns
    (n_batches, n_input_rows).

    This is the transactional upgrade of run_continuous_rollup_table:
    instead of append + last-write-wins-at-read, every micro-batch is
    one atomic copy-on-write merge commit keyed by ROLLUP_KEYS, so
    readers always see a complete consistent rollup (and can time
    travel across batch boundaries). Exactly-once comes from the
    manifest op stamp: the sink writes ``stream-merge:batch={id}``
    and SKIPS any batch id already committed — a foreachBatch retry
    after a crash between commit and checkpoint advance becomes a
    no-op, the Delta streaming-sink txn protocol on plain parquet.
    """
    from ensembl_lakehouse_spark import snapshots as SN

    # Load the committed-stamp set ONCE per run and extend it locally
    # per commit: checking membership via committed_ops() on every
    # micro-batch re-reads every retained manifest (O(versions) JSON
    # opens per batch, O(N²) per run) — a long-lived table made each
    # commit slower as history grew. A restart reloads the set from
    # disk, so the exactly-once property is unchanged.
    committed: set[str] = set(SN.committed_ops(table_dir))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        stamp = f"stream-merge:batch={batch_id}"
        if stamp in committed:
            return  # replayed batch: already durably committed
        if batch_df.isEmpty():
            # watermark-advance batches emit no updates; skipping
            # them (rather than stamping) is safe — replaying an
            # empty batch is itself a no-op
            return
        # FILE-SCOPED merge on the window-start hour: a micro-batch
        # only re-emits windows the watermark still holds open, so
        # its hour range is narrow and the rewrite touches O(open
        # windows) files, never the table's history — the manifest's
        # temporal min/max stats (epoch-micros normalized) prune
        # every closed-hour file. Composes round 5's scoped MERGE
        # with the exactly-once op stamps.
        SN.merge_snapshot(
            batch_df.sparkSession, table_dir, batch_df,
            key=list(ROLLUP_KEYS), op=stamp, scope_by="hour",
        )
        committed.add(stamp)

    return _drive(spark, events_dir, merge_batch, max_files_per_trigger, checkpoint_dir)


def snapshot_rollup_view(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current rollup state — the snapshot read itself (merge
    resolved state at WRITE time; no read-time window needed, unlike
    rollup_table_view's append log)."""
    from ensembl_lakehouse_spark import snapshots as SN

    return SN.read_snapshot(spark, table_dir)


def compact_rollup_table(spark: SparkSession, table_dir: str) -> None:
    """Fold the append log to one row per key (the OPTIMIZE step).

    Writes the resolved view to a sibling directory, then swaps it in
    with two renames — the closest to atomic a plain filesystem
    offers; a transactional table format makes this a real commit."""
    import shutil

    staged = table_dir.rstrip("/") + "__compact"
    old = table_dir.rstrip("/") + "__old"
    (
        rollup_table_view(spark, table_dir)
        .withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .parquet(staged)
    )
    os.rename(table_dir, old)
    os.rename(staged, table_dir)
    shutil.rmtree(old)
