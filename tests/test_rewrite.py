"""Materialized-view rewrite: a rollup-answered aggregate equals
the base-table aggregate exactly (full keys, subset regroup, global
agg), strict freshness falls back on staleness, non-derivable
requests fall back with a recorded reason, and the rollup path
provably never touches base-table files."""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark import ivm
from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.plans import rewrite as RW


@pytest.fixture()
def fixture(spark, tmp_path):
    src = str(tmp_path / "src")
    rol = str(tmp_path / "rollup")
    rows = [(i, f"g{i % 3}", f"r{i % 2}", i * 7) for i in range(60)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "grp", "reg", "val"])
    )
    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    cat = RW.RollupCatalog()
    cat.register("by_grp_reg", rol, src, ["grp", "reg"], "val")
    return src, rol, cat


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


AGGS = {
    "n": ("count", "val"),
    "total": ("sum", "val"),
    "mean": ("avg", "val"),
}


def test_rewrite_equals_base_on_full_subset_and_global(spark, fixture):
    src, rol, cat = fixture
    for group_by in (["grp", "reg"], ["grp"], []):
        got, why = RW.answer_aggregate(spark, cat, src, group_by, AGGS)
        assert why["used"] == "rollup", why
        empty = RW.RollupCatalog()  # base path = ground truth
        want, why_b = RW.answer_aggregate(spark, empty, src, group_by, AGGS)
        assert why_b["used"] == "base"
        assert _sorted(got) == _sorted(want)


def test_rollup_answer_reads_only_rollup_files(spark, fixture):
    src, rol, cat = fixture
    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "rollup"
    files = got.inputFiles()
    assert files and all(rol in f for f in files)
    assert not any(src in f for f in files)


def test_strict_freshness_falls_back_then_recovers(spark, fixture):
    src, rol, cat = fixture
    extra = spark.createDataFrame(
        [(1000, "g0", "r0", 999_983)], ["k", "grp", "reg", "val"]
    )
    SN.write_snapshot(src, extra, mode="append")

    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "base"
    assert why["skipped"][0]["reason"].startswith("stale")
    by_grp = {r.grp: r for r in got.collect()}
    assert by_grp["g0"].total >= 999_983  # fallback sees the new row

    stale, why_s = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, freshness="stale_ok"
    )
    assert why_s["used"] == "rollup"
    assert {r.grp: r.total for r in stale.collect()}["g0"] == (
        by_grp["g0"].total - 999_983
    )

    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    got2, why2 = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why2["used"] == "rollup"
    assert _sorted(got2) == _sorted(got)


def test_non_derivable_requests_fall_back_with_reason(spark, fixture):
    src, rol, cat = fixture
    # measure column the rollup does not maintain
    _, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"s": ("sum", "k")}
    )
    assert why["used"] == "base"
    assert "maintains sum(val)" in why["skipped"][0]["reason"]
    # non-self-maintainable aggregate
    _, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"m": ("min", "val")}
    )
    assert why["used"] == "base"
    assert "not derivable" in why["skipped"][0]["reason"]
    # group key outside the rollup's keys
    _, why = RW.answer_aggregate(spark, cat, src, ["k"], AGGS)
    assert why["used"] == "base"
    assert "not in rollup keys" in why["skipped"][0]["reason"]


def test_tombstoned_groups_never_resurface(spark, fixture):
    src, rol, cat = fixture
    # drop group g2 entirely via overwrite, then maintain
    kept = SN.read_snapshot(spark, src).where("grp <> 'g2'")
    SN.write_snapshot(src, kept, mode="overwrite")
    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "rollup"
    assert "g2" not in {r.grp for r in got.collect()}


def test_cheapest_matching_rollup_wins(spark, fixture):
    src, rol, cat = fixture
    rol2 = rol + "_coarse"
    ivm.maintain_rollup(spark, src, rol2, ["grp"], "val")
    cat.register("by_grp", rol2, src, ["grp"], "val")
    _, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["rollup"] == "by_grp"  # fewer keys ⇒ preferred
    _, why = RW.answer_aggregate(spark, cat, src, ["grp", "reg"], AGGS)
    assert why["rollup"] == "by_grp_reg"  # coarse one can't serve
    assert why["skipped"][0]["rollup"] == "by_grp"


def test_metadata_counts_answer_without_reading_data(spark, fixture):
    src, rol, cat = fixture
    from ensembl_lakehouse_spark import snapshots as SN

    # manifest rowcount agrees with the scan at every version
    assert SN.table_rowcount(src) == SN.read_snapshot(spark, src).count()

    got, why = RW.answer_aggregate(
        spark, cat, src, [], {"n": ("count", ""), "m": ("count", "x")}
    )
    assert why["used"] == "metadata"
    assert got.inputFiles() == []  # zero data reads — a local relation
    row = got.collect()[0]
    assert row.n == row.m == 60

    # stays exact through COW DML (update rewrites, delete removes)
    SN.update_snapshot(spark, src, where="k < 5", set={"val": "val + 1"})
    SN.delete_snapshot(spark, src, where="k >= 55")
    assert SN.table_rowcount(src) == 55
    got2, why2 = RW.answer_aggregate(spark, cat, src, [], {"n": ("count", "")})
    assert why2["used"] == "metadata"
    assert got2.collect()[0].n == 55

    # grouping or non-count measures never take the metadata path
    _, why3 = RW.answer_aggregate(spark, cat, src, ["grp"], {"n": ("count", "")})
    assert why3["used"] != "metadata"
    _, why4 = RW.answer_aggregate(spark, cat, src, [], {"s": ("sum", "val")})
    assert why4["used"] != "metadata"
