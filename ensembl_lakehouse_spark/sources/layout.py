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
