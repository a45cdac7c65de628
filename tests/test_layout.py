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
