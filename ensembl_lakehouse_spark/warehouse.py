"""Persistent warehouse catalog: restart-surviving tables.

The reference's schema layer lives in AWS Glue and therefore survives
process restarts (reference app/constants.py:12-13 names the Glue
catalog + database; every Athena query resolves tables through it).
The repo's default `Catalog` registers session-scoped temp views from
parquet paths — correct for tests, but metadata dies with the session.

This module closes that gap with Spark's own durable catalog path:

- ``warehouse_session()`` builds a SparkSession with
  ``enableHiveSupport()`` and an embedded Derby metastore pinned
  under the repo's ``spark-warehouse/`` sibling ``metastore_db/``.
  The pyspark distribution ships the hive-metastore + derby jars, so
  this needs nothing outside the environment.
- ``persist_fixture_tables()`` writes fixture tables with
  ``saveAsTable`` — parquet files land in ``spark.sql.warehouse.dir``
  and the table metadata (schema, partition columns) lands in the
  Derby metastore, exactly the restart-durable split Glue provides.
  Tables with a configured mandatory-filter key (the reference's
  ``species`` analog) are partitioned by it, so the reference's
  forced ``species='...'`` equality becomes partition pruning: at
  100 TB the scan touches only the selected species' files.

Restart durability is proven in ``tests/test_warehouse.py`` by
running writer and reader in *separate OS processes* (fresh JVMs):
the reader serves ``/filters/{data_type}``-shaped metadata straight
from the metastore without any re-registration.

Embedded Derby admits one JVM at a time; that is a test-harness
constraint, not a design one — on a cluster the same two settings
point at a shared Hive metastore service (or Glue itself) and
``saveAsTable`` code is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ensembl_lakehouse_spark.catalog import DEFAULT_KEY_COLUMN, FIXTURE_TABLES
from ensembl_lakehouse_spark.sources.tables import load_table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def warehouse_session(
    app_name: str = "elh-warehouse",
    warehouse_dir: str | None = None,
    metastore_dir: str | None = None,
    master: str | None = None,
) -> SparkSession:
    """SparkSession whose catalog persists across process restarts.

    Uses the in-distribution Hive support with an embedded Derby
    metastore. Both directories default to repo-local paths so the
    whole warehouse is self-contained and inspectable.
    """
    from ensembl_lakehouse_spark.session import _BASE_CONF, _DEFAULT_CPUS

    warehouse_dir = warehouse_dir or os.path.join(_REPO_ROOT, "spark-warehouse")
    metastore_dir = metastore_dir or os.path.join(_REPO_ROOT, "metastore_db")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{_DEFAULT_CPUS}]")
        .config("spark.sql.warehouse.dir", warehouse_dir)
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir};create=true",
        )
        .enableHiveSupport()
    )
    for key, value in _BASE_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def persist_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    partition_by: str | None = None,
) -> None:
    """``saveAsTable`` a DataFrame as a managed parquet table.

    ``overwrite`` keeps the operation idempotent (re-registering a
    fixture is a no-op semantically). Partitioning by the mandatory
    key column mirrors the reference's per-``species`` access path as
    physical layout: each key value becomes a directory the planner
    prunes without reading a footer.
    """
    writer = df.write.format("parquet").mode("overwrite")
    if partition_by is not None and partition_by in df.columns:
        writer = writer.partitionBy(partition_by)
    writer.saveAsTable(name)


def persist_fixture_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = FIXTURE_TABLES,
) -> list[str]:
    """Persist every fixture table found under ``sf_dir``; returns the
    names written. Schema quirks (nanos timestamps) are normalized by
    ``load_table`` before the write, so what the metastore records is
    the engine's canonical schema."""
    written = []
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        persist_table(spark, name, df, partition_by=DEFAULT_KEY_COLUMN.get(name))
        written.append(name)
    return written


def persistent_tables(spark: SparkSession) -> list[str]:
    """Names of restart-durable (metastore-backed) tables, excluding
    temp views."""
    return sorted(
        t.name
        for t in spark.catalog.listTables()
        if (t.tableType or "").upper() != "TEMPORARY"
    )
