"""Semantic pins for the round-9 batch-6 operators — value-level
properties the oracle hash can't express (conservation, bounds,
ordering identities)."""

from __future__ import annotations

import duckdb

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import reports as RP
from tests.conftest import SF_DIR


def _scalar(sql: str):
    return duckdb.sql(sql).fetchone()[0]


def test_order_line_dominance_conserves_orders(spark):
    rows = RP.order_line_dominance(spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == _scalar(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        assert 0 <= r.dominance_band <= 10
        assert r.avg_width_x100 >= 100  # every order has >= 1 line
    # the all-in-one-line band is exactly the single-line orders
    top = next((r for r in rows if r.dominance_band == 10), None)
    if top is not None:
        assert top.avg_width_x100 == 100


def test_customer_nation_mix_share_sums_to_nation(spark):
    rows = RP.customer_nation_mix_share(spark, SF_DIR).collect()
    assert sum(r.n_customers for r in rows) == _scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'"
    )
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
        assert 0 <= r.nation_share_bp <= 10000
    for segs in by_nation.values():
        # truncating DIV: shares sum to 10000 minus < |segments|
        s = sum(r.nation_share_bp for r in segs)
        assert 10000 - len(segs) < s <= 10000


def test_monthly_revenue_range_bounds(spark):
    for r in RP.monthly_revenue_range(spark, SF_DIR).collect():
        assert 1 <= r.n_months <= 12
        assert r.worst_month_cents <= r.best_month_cents
        assert r.worst_month_cents <= r.year_cents
        assert 0 <= r.range_share_bp <= 10000


def test_region_segment_share_partition_identity(spark):
    rows = RP.region_segment_share(spark, SF_DIR).collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, 0)
        by_region[r.r_name] += r.revenue_cents
    # every region's shares reconstruct against its own total
    for r in rows:
        assert r.region_share_bp == (
            r.revenue_cents * 10000
        ) // by_region[r.r_name]


def test_order_gap_bands_count_all_consecutive_pairs(spark):
    rows = RP.order_gap_bands_by_segment(spark, SF_DIR).collect()
    n_orders = _scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    n_custs = _scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    # each customer with k orders contributes k-1 gaps
    assert sum(r.n_gaps for r in rows) == n_orders - n_custs


def test_top_customer_share_bounds(spark):
    for r in RP.top_customer_share_by_nation(spark, SF_DIR).collect():
        assert r.top_customer_cents <= r.revenue_cents
        # top account's share can't be below the uniform share
        assert r.top1_share_bp >= 10000 // r.active_customers
        assert r.top1_share_bp <= 10000


def test_orders_quarter_growth_matches_float_recurrence(spark):
    import math

    rows = sorted(
        RP.orders_quarter_growth(spark, SF_DIR).collect(),
        key=lambda r: r.yq,
    )
    assert rows[0].qoq_bp is None
    for prev, cur in zip(rows, rows[1:]):
        expect = math.floor(
            (cur.revenue_cents - prev.revenue_cents)
            * 10000.0
            / prev.revenue_cents
        )
        assert cur.qoq_bp == expect


def test_supplier_quartiles_ordered(spark):
    for r in RP.supplier_balance_quartiles_by_nation(
        spark, SF_DIR
    ).collect():
        assert r.q1_cents <= r.median_cents <= r.q3_cents
        assert r.iqr_cents == r.q3_cents - r.q1_cents


def test_retention_by_first_type_covers_every_user(spark):
    rows = R.events_retention_by_first_type(spark, SF_DIR).collect()
    assert sum(r.cohort_users for r in rows) == _scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 0 <= r.retained_week1 <= r.cohort_users
        assert 0 <= r.retention_bp <= 10000


def test_user_first_day_value_covers_every_user(spark):
    rows = R.user_first_day_value(spark, SF_DIR).collect()
    assert sum(r.cohort_users for r in rows) == _scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert r.per_user_cents == r.first_day_cents // r.cohort_users


def test_peak_hour_share_is_the_max_hour(spark):
    rows = R.events_peak_hour_share(spark, SF_DIR).collect()
    grid = duckdb.sql(
        f"SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    best: dict = {}
    for t, h, n in grid:
        cur = best.get(t)
        # ties toward the earliest hour — the operator's contract
        if cur is None or n > cur[1] or (n == cur[1] and h < cur[0]):
            best[t] = (h, n)
    for r in rows:
        assert (r.peak_hour, r.peak_events) == best[r.event_type]
        # a uniform 24h profile floors at 416 bp
        assert r.peak_share_bp >= 416
