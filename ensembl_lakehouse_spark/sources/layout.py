"""Lake layout: partitioned writes + pruning verification.

The reference's one physical-layout decision is implicit: every
query is forced through ``WHERE species='...'`` (app/main.py:479),
i.e. `species` is the de-facto horizontal partition key. SURVEY §4
marks the corresponding Spark decision: write the lake
``partitionBy(key)`` so the mandatory filter becomes *static
partition pruning* — at 100 TB the difference between scanning one
species' directory and scanning everything and discarding 95 %.

This module owns that decision:

- :func:`write_partitioned` — hive-style partitioned parquet write.
- :func:`read_pruned` — read + mandatory-key filter, the layout's
  read path.
- :func:`pruning_report` — evidence extractor: the scan's
  PartitionFilters and the distinct files actually read, so tests
  (tests/test_layout.py) can ASSERT pruning instead of trusting it.

Scale notes: partition count = |key values|, so only
low-cardinality keys (species, returnflag, date) belong in the
path; high-cardinality co-location uses bucketing instead
(``bucketBy`` needs a metastore table — documented here, exercised
where a warehouse dir exists). Small-file pressure at high
partition counts is the other classic failure: repartition by the
partition key before writing so each partition directory gets
O(few) files, which is what write_partitioned does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(df: DataFrame, path: str, key_col: str) -> None:
    """Write ``df`` hive-partitioned by ``key_col``.

    The pre-write ``repartition(key)`` lines each output task up
    with one partition value → one (or few) files per directory
    instead of |tasks|·|values| small files.
    """
    df.repartition(F.col(key_col)).write.mode("overwrite").partitionBy(key_col).parquet(path)


def read_pruned(spark: SparkSession, path: str, key_col: str, key_value: str) -> DataFrame:
    """The mandatory-key read path over a partitioned lake."""
    return spark.read.parquet(path).where(F.col(key_col) == key_value)


def write_bucketed(
    df: DataFrame, table_name: str, path: str, key_col: str, n_buckets: int = 8
) -> None:
    """Write ``df`` as an external bucketed table: rows hash-
    partitioned into ``n_buckets`` files by ``key_col``, each bucket
    sorted on it.

    Bucketing is the co-location tool for HIGH-cardinality keys
    (orderkey, custkey, doc_id) where ``partitionBy`` would explode
    into millions of directories: two tables bucketed on their join
    keys with the same bucket count join WITHOUT a shuffle — the
    exchange that dominates every large fact⋈fact join simply
    disappears from the plan (asserted in tests/test_layout.py, not
    assumed). At 100 TB this is the difference between re-shuffling
    both tables per join and paying the layout cost once at write
    time, amortized over every subsequent join/agg on that key.

    ``bucketBy`` requires a catalog table (the bucket spec lives in
    table metadata, not the files); ``option("path", ...)`` keeps
    the data external at ``path`` with only metadata in the session
    catalog.
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col)
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys — the
    read path that consumes write_bucketed's layout. With matching
    bucket counts Spark plans a SortMergeJoin with NO Exchange on
    either side (and, because buckets are sorted, no Sort either)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def pruning_report(df: DataFrame) -> dict:
    """Extract pruning evidence from a DataFrame's executed plan:
    the FileScan's PartitionFilters text and the files actually
    touched (via input_file_name on the live scan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    partition_filters = [
        line.strip() for line in plan.splitlines() if "PartitionFilters" in line
    ]
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    return {"partition_filters": partition_filters, "files": files}


def compact(
    spark: SparkSession, src_path: str, dst_path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ⌈input_bytes / target_file_bytes⌉ files.

    The classic lake-maintenance job — streaming sinks and
    high-cardinality partitionBy writes leave thousands of KB-sized
    files, and at 100 TB the per-file open/footer cost plus the
    scheduler's per-split overhead dominate scans long before I/O
    does. Target count comes from the actual on-disk byte size (not
    file count), so compaction is idempotent: re-running on compacted
    output is a no-op rewrite to the same count.

    Returns {files_before, files_after, bytes}: the evidence tests
    assert on (tests/test_layout.py), same policy as pruning_report —
    measured facts, not trust.
    """
    import glob
    import os

    files = [
        f
        for f in glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src_path).repartition(n_out).write.mode("overwrite").parquet(dst_path)
    out = [
        f
        for f in glob.glob(os.path.join(dst_path, "*.parquet"))
        if os.path.isfile(f)
    ]
    return {"files_before": len(files), "files_after": len(out), "bytes": total}


def write_clustered(df: DataFrame, path: str, sort_col: str, n_files: int = 8) -> None:
    """Range-clustered write: range-partition on ``sort_col`` then
    sort within each file — the 1-D clustering (Z-order's simple
    case) that makes parquet row-group min/max statistics selective.

    After this write, a range/point predicate on ``sort_col`` skips
    whole files and row groups via footer stats alone; on a random
    layout every row group's [min,max] spans the full domain and
    nothing skips. ``repartitionByRange`` samples the column to cut
    balanced ranges — the same mechanics a Delta OPTIMIZE ZORDER
    runs, minus the space-filling curve.
    """
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def skipping_report(path: str, col: str, lo, hi) -> dict:
    """Row-group skipping evidence from parquet footers: how many
    row groups could a [lo, hi] range predicate on ``col`` skip,
    judged ONLY by their min/max statistics (what any engine's
    reader sees before touching data pages).

    Returns {row_groups, skippable, skippable_frac}. The layout
    tests assert clustered ≫ random — measured from the same footer
    metadata production scans use, not inferred from the plan.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    total = skippable = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.to_arrow_schema().get_field_index(col)
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(idx).statistics
            total += 1
            if stats is not None and (stats.min > hi or stats.max < lo):
                skippable += 1
    return {
        "row_groups": total,
        "skippable": skippable,
        "skippable_frac": (skippable / total) if total else 0.0,
    }


#: Bits per dimension in the Z-order interleave (2 dims × ZBITS ≤ 62).
ZBITS = 8


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
) -> None:
    """Z-order-clustered write on TWO columns: normalize each to a
    ZBITS-bit integer (min-max scaled), interleave the bits into one
    Morton key, then range-partition + sort on that key — Delta
    OPTIMIZE ZORDER's mechanics on plain parquet.

    Why the curve matters: 1-D clustering (write_clustered) makes
    row-group stats selective on ONE column and useless on the
    other; the Morton interleave gives every file a small rectangle
    of (x, y) space, so range predicates on EITHER column skip via
    footer stats — the property the layout tests measure directly.

    The min/max scan is one 1-row aggregate (same bounded-collect
    class as catalog key enumeration); everything else is a map-side
    expression + one range exchange. The Morton key column
    ``_zval`` is retained in the files (harmless, and it lets tests
    and future OPTIMIZE passes see the clustering key).
    """
    (
        with_morton_key(df, col_x, col_y)
        .repartitionByRange(n_files, F.col("_zval"))
        .sortWithinPartitions("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_morton_key(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Append the Morton (Z-order) key column ``_zval`` interleaving
    ``col_x``/``col_y`` min-max-normalized to ZBITS bits each — the
    shared clustering-key builder for write_zordered and for
    snapshot-layer 2-d skipping (``snapshots.write_snapshot(df_z,
    cluster_by=["_zval"])`` makes manifest stats rectangular in
    (x, y), so ``files_for_range`` prunes on EITHER column).

    The min/max scan is one 1-row aggregate (bounded-collect class).
    """
    lo_hi = df.agg(
        F.min(col_x).alias("xlo"),
        F.max(col_x).alias("xhi"),
        F.min(col_y).alias("ylo"),
        F.max(col_y).alias("yhi"),
    ).collect()[0]
    scale = (1 << ZBITS) - 1

    def norm(col: str, lo, hi) -> str:
        span = (hi - lo) or 1
        return (
            f"CAST(floor((CAST({col} AS DOUBLE) - {lo!r}) * {scale} / {span!r})"
            f" AS BIGINT)"
        )

    interleave = " + ".join(
        f"(shiftright(xb, {i}) % 2) * {1 << (2 * i)}"
        f" + (shiftright(yb, {i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(ZBITS)
    )
    return (
        df.withColumn("xb", F.expr(norm(col_x, lo_hi.xlo, lo_hi.xhi)))
        .withColumn("yb", F.expr(norm(col_y, lo_hi.ylo, lo_hi.yhi)))
        .withColumn("_zval", F.expr(interleave))
        .drop("xb", "yb")
    )
