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
