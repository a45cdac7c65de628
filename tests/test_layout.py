"""Partition-layout tests: the species-analog partitionBy decision
must produce real static partition pruning (SURVEY §4's one custom
layout decision) — asserted from the executed plan and the files
actually read, not assumed."""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark.sources import layout as L
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "lineitem_by_flag")
    L.write_partitioned(load_table(spark, SF_DIR, "lineitem"), path, "l_returnflag")
    return path


def test_partitioned_write_layout(spark, partitioned_lake):
    import os

    dirs = sorted(
        d for d in os.listdir(partitioned_lake) if d.startswith("l_returnflag=")
    )
    assert dirs == ["l_returnflag=A", "l_returnflag=N", "l_returnflag=R"]
    # repartition-by-key before write: each partition dir holds ONE
    # data file, not |tasks| small files.
    for d in dirs:
        files = [
            f for f in os.listdir(os.path.join(partitioned_lake, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)


def test_mandatory_filter_prunes_partitions(spark, partitioned_lake):
    df = L.read_pruned(spark, partitioned_lake, "l_returnflag", "R")
    report = L.pruning_report(df)
    assert report["partition_filters"], "no PartitionFilters in the scan"
    assert any("l_returnflag" in f and "= R" in f for f in report["partition_filters"])
    # The decisive evidence: only the R directory's files were read.
    assert report["files"]
    assert all("l_returnflag=R" in f for f in report["files"])


def test_pruned_read_is_complete(spark, partitioned_lake):
    expected = (
        load_table(spark, SF_DIR, "lineitem").where("l_returnflag = 'R'").count()
    )
    assert L.read_pruned(spark, partitioned_lake, "l_returnflag", "R").count() == expected


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    L.write_bucketed(
        load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "t_li_bucketed",
        str(base / "lineitem"),
        "l_orderkey",
    )
    L.write_bucketed(
        load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority"),
        "t_ord_bucketed",
        str(base / "orders"),
        "o_orderkey",
    )
    yield "t_li_bucketed", "t_ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """The whole point of the bucketed layout: the fact⋈fact join
    plan must contain ZERO exchanges — co-location was paid for at
    write time. Broadcast is disabled so the assert can't be
    satisfied by the small fixture side-stepping the question."""
    li, ords = bucketed_tables
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = L.bucketed_join(
            spark, li, ords, F.col("l_orderkey") == F.col("o_orderkey")
        )
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it is the same join result the unbucketed path produces
    expected = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == expected


def test_compaction_reduces_file_count(spark, tmp_path_factory):
    """Many small files in, ceil(bytes/target) files out, same rows;
    idempotent on re-run."""
    src = str(tmp_path_factory.mktemp("compact") / "small")
    dst = str(tmp_path_factory.mktemp("compact") / "big")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    li.repartition(64).write.parquet(src)  # deliberately shattered
    report = L.compact(spark, src, dst, target_file_bytes=1 << 30)
    assert report["files_before"] == 64
    assert report["files_after"] == 1  # fixture ≪ 1 GiB target
    assert spark.read.parquet(dst).count() == li.count()
    # Idempotence: compacting the compacted output is a same-count rewrite.
    dst2 = dst + "_again"
    report2 = L.compact(spark, dst, dst2, target_file_bytes=1 << 30)
    assert report2["files_after"] == report["files_after"]


def test_clustered_write_enables_rowgroup_skipping(spark, tmp_path_factory):
    """Range-clustered layout: a narrow range predicate must be able
    to skip most row groups on footer stats; the same data written
    randomly skips (almost) none. Judged from the actual parquet
    footers, not the plan."""
    base = tmp_path_factory.mktemp("cluster")
    clustered, random = str(base / "clustered"), str(base / "random")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    L.write_clustered(orders, clustered, "o_orderkey", n_files=8)
    orders.repartition(8).write.parquet(random)  # round-robin: every file spans the domain

    lo, hi = 1, 100  # ~the lowest keys: one range file should cover them
    rep_c = L.skipping_report(clustered, "o_orderkey", lo, hi)
    rep_r = L.skipping_report(random, "o_orderkey", lo, hi)
    assert rep_c["row_groups"] >= 8
    assert rep_c["skippable_frac"] >= 0.8, rep_c
    assert rep_r["skippable_frac"] == 0.0, rep_r
    # Correctness unchanged by layout: same rows under the predicate.
    n_c = spark.read.parquet(clustered).where(f"o_orderkey between {lo} and {hi}").count()
    n_r = spark.read.parquet(random).where(f"o_orderkey between {lo} and {hi}").count()
    assert n_c == n_r > 0


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path_factory):
    """Z-order layout: narrow range predicates on EITHER clustered
    column must skip a large fraction of row groups on footer stats;
    a 1-D clustering on x skips nothing on y (the reason the curve
    exists). Judged from parquet footers, like the 1-D test."""
    base = tmp_path_factory.mktemp("zorder")
    zpath, xpath = str(base / "z"), str(base / "x1d")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    L.write_zordered(orders, zpath, "o_orderkey", "o_custkey", n_files=16)
    L.write_clustered(orders, xpath, "o_orderkey", n_files=16)

    stats = orders.selectExpr(
        "min(o_orderkey) AS klo", "max(o_orderkey) AS khi",
        "min(o_custkey) AS clo", "max(o_custkey) AS chi",
    ).collect()[0]
    # ~1/8 of each domain
    kw = (stats.khi - stats.klo) // 8
    cw = (stats.chi - stats.clo) // 8
    k_rng = (stats.klo, stats.klo + kw)
    c_rng = (stats.clo, stats.clo + cw)

    z_on_x = L.skipping_report(zpath, "o_orderkey", *k_rng)
    z_on_y = L.skipping_report(zpath, "o_custkey", *c_rng)
    x_on_y = L.skipping_report(xpath, "o_custkey", *c_rng)
    # the curve buys skipping on BOTH dims...
    assert z_on_x["skippable_frac"] >= 0.5, z_on_x
    assert z_on_y["skippable_frac"] >= 0.5, z_on_y
    # ...which 1-D clustering cannot give on the second dim
    assert x_on_y["skippable_frac"] <= z_on_y["skippable_frac"], (x_on_y, z_on_y)

    # Correctness unchanged by layout.
    n_z = (
        spark.read.parquet(zpath)
        .where(f"o_custkey between {c_rng[0]} and {c_rng[1]}")
        .count()
    )
    n_x = (
        spark.read.parquet(xpath)
        .where(f"o_custkey between {c_rng[0]} and {c_rng[1]}")
        .count()
    )
    assert n_z == n_x > 0
