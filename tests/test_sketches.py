"""Sketch operators: CMS one-sided error law, HLL estimate sanity
vs exact, and sketch mergeability (the property that makes them
partial-agg/streaming-state safe)."""

from __future__ import annotations

from ensembl_lakehouse_spark.operators import sketches as SK
from tests.conftest import SF_DIR


def test_count_min_is_one_sided(spark):
    rows = SK.sketch_count_min(spark, SF_DIR).collect()
    assert 0 < len(rows) <= SK.CMS_TOPK
    for r in rows:
        # CMS never underestimates; overestimate == est - exact >= 0
        assert r.cf_est >= r.cf_exact
        assert r.overestimate == r.cf_est - r.cf_exact
    cfs = [r.cf_exact for r in rows]
    assert cfs == sorted(cfs, reverse=True)


def test_hll_estimate_in_sane_band(spark):
    rows = SK.sketch_hll_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_exact >= 1
        assert 0 <= r.n_zero_registers <= SK.HLL_M
        assert r.hll_raw_estimate > 0
        # m=16 raw HLL is coarse; require order-of-magnitude agreement
        # (raw form overestimates small n until linear counting is
        # applied, so the band is wide and one-sided-ish)
        assert r.hll_raw_estimate < r.n_exact * 10


def test_hll_registers_merge_like_partial_aggs(spark):
    """MAX-merging registers computed on two halves equals registers
    computed on the union — the mergeability contract."""
    from pyspark.sql import functions as F

    from ensembl_lakehouse_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id")
    hashed = ev.selectExpr(
        "event_type",
        "user_id",
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) AS h",
    ).selectExpr(
        "event_type", "user_id",
        f"h % {SK.HLL_M} AS idx", f"h DIV {SK.HLL_M} AS rest",
    ).selectExpr(
        "event_type", "user_id", "idx",
        f"CASE WHEN rest = 0 THEN {SK.HLL_FPBITS}"
        f" ELSE LEAST(1 + length(regexp_extract(bin(rest), '0*$', 0)),"
        f" {SK.HLL_FPBITS}) END AS rho",
    )
    whole = {
        (r.event_type, r.idx): r.m
        for r in hashed.groupBy("event_type", "idx").agg(F.max("rho").alias("m")).collect()
    }
    lo = hashed.where(F.col("user_id") % 2 == 0)
    hi = hashed.where(F.col("user_id") % 2 == 1)
    merged: dict = {}
    for half in (lo, hi):
        for r in half.groupBy("event_type", "idx").agg(F.max("rho").alias("m")).collect():
            k = (r.event_type, r.idx)
            merged[k] = max(merged.get(k, 0), r.m)
    assert merged == whole
