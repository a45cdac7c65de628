"""Semantic pins for the round-7 operator batches — value-level
properties the oracle hash can't express (conservation, bounds,
monotonicity, cross-run determinism)."""

from __future__ import annotations


from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR, duckdb_scalar


def test_text_hapax_ratio_bounds_and_conservation(spark):
    rows = {r.lang: r for r in T.text_hapax_ratio(spark, SF_DIR).collect()}
    assert rows  # every fixture language present
    for r in rows.values():
        assert 0 < r.vocab <= r.tokens
        assert 0 <= r.hapax + r.dis <= r.vocab
        assert 0 <= r.hapax_bp <= 10000 and 0 <= r.dis_bp <= 10000
        assert r.hapax_bp == r.hapax * 10000 // r.vocab


def test_text_zipf_check_head_is_ordered_and_sums(spark):
    rows = T.text_zipf_check(spark, SF_DIR).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.c for r in rows]
    assert counts == sorted(counts, reverse=True)  # head is by frequency
    for r in rows:
        assert r.rank_x_count == r.rank * r.c
        assert 0 <= r.share_pm <= 1000


def test_text_ttr_curve_is_monotone_nonincreasing(spark):
    rows = sorted(T.text_ttr_curve(spark, SF_DIR).collect(), key=lambda r: r.band)
    assert rows
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    )
    # Heaps' law: pooled TTR falls (or holds) as the band lengthens
    ttrs = [r.ttr_bp for r in rows]
    assert all(a >= b for a, b in zip(ttrs, ttrs[1:])), ttrs
    for r in rows:
        assert 0 < r.types <= r.tokens


def test_lang_vocab_overlap_is_symmetric_complete_and_bounded(spark):
    rows = T.lang_vocab_overlap(spark, SF_DIR).collect()
    langs = set()
    for r in rows:
        langs |= {r.lang_a, r.lang_b}
        assert r.lang_a < r.lang_b  # each unordered pair exactly once
        assert 0 < r.inter <= min(r.vocab_a, r.vocab_b)
        assert 0 <= r.jaccard_e6 <= 1_000_000
    n = len(langs)
    assert len(rows) == n * (n - 1) // 2


def test_events_dow_anomaly_rows_exceed_threshold(spark):
    rows = R.events_dow_anomaly(spark, SF_DIR).collect()
    assert rows  # the threshold is calibrated to fire on the fixture
    for r in rows:
        assert abs(r.z_e3) >= 1300
        assert 0 <= r.dow <= 6
        assert r.n > 1 and r.c > 0


def test_events_cusum_shift_magnitude_and_location(spark):
    rows = {r.event_type: r for r in R.events_cusum_shift(spark, SF_DIR).collect()}
    assert rows
    day_lo = duckdb_scalar(
        f"SELECT CAST(floor(epoch(MIN(ts))/86400) AS BIGINT) "
        f"FROM '{SF_DIR}/events.parquet'"
    )
    day_hi = duckdb_scalar(
        f"SELECT CAST(floor(epoch(MAX(ts))/86400) AS BIGINT) "
        f"FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows.values():
        assert day_lo <= r.shift_day <= day_hi
        assert 0 <= r.shift_e6 <= 1_000_000
        assert abs(r.cusum) <= r.n * r.total  # |S_t| bound


def test_events_gap_histogram_conserves_gaps(spark):
    rows = {r.band: r for r in R.events_gap_histogram(spark, SF_DIR).collect()}
    n_events = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    n_users = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    assert sum(r.n_gaps for r in rows.values()) == n_events - n_users
    assert sum(r.share_bp for r in rows.values()) <= 10000  # floor DIV
    for r in rows.values():
        assert 0 <= r.min_gap_s <= r.max_gap_s


def test_events_user_concentration_curve_shape(spark):
    rows = sorted(
        R.events_user_concentration(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n_events = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    n_users = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    assert sum(r.events for r in rows) == n_events
    assert sum(r.n_users for r in rows) == n_users
    # decile 1 holds the heaviest users: per-user max is non-increasing
    maxes = [r.max_events for r in rows]
    assert all(a >= b for a, b in zip(maxes, maxes[1:]))
    # cumulative share ends at ~100 % (floor DIV rounds down)
    assert rows[-1].cum_share_bp in (9999, 10000)
    shares = [r.share_bp for r in rows]
    assert shares[0] == max(shares)


# ---- batch 3: business-analytics pack ----

from ensembl_lakehouse_spark.operators import reports as RP  # noqa: E402


def test_part_type_margin_accounting_identity(spark):
    rows = RP.part_type_margin(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.net_cents <= r.list_cents
        assert 0 <= r.giveback_bp <= 10000
        assert 0 <= r.revenue_share_bp <= 10000
    assert 9990 <= sum(r.revenue_share_bp for r in rows) <= 10000


def test_seasonal_index_is_centered(spark):
    rows = sorted(RP.seasonal_index(spark, SF_DIR).collect(), key=lambda r: r.mon)
    assert [r.mon for r in rows] == list(range(1, 13))
    n_orders = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    assert sum(r.n_orders for r in rows) == n_orders
    # index averages to ~10000 across months (floor DIV rounds down)
    mean_idx = sum(r.index_bp for r in rows) / 12
    assert 9900 <= mean_idx <= 10000
    for r in rows:
        assert r.index_bp == r.rev_cents * 120000 // sum(x.rev_cents for x in rows)


def test_customer_order_cadence_gap_conservation(spark):
    rows = {r.c_mktsegment: r for r in RP.customer_order_cadence(spark, SF_DIR).collect()}
    assert rows
    # gaps = orders - customers-with-orders, distributed over segments
    n_orders = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    n_cust = duckdb_scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    assert sum(r.n_gaps for r in rows.values()) == n_orders - n_cust
    for r in rows.values():
        assert 0 <= r.min_gap_d <= r.max_gap_d
        assert r.mean_gap_e3 == r.sum_gap_d * 1000 // r.n_gaps


def test_part_supply_concentration_head_is_sound(spark):
    rows = RP.part_supply_concentration(spark, SF_DIR).collect()
    assert len(rows) == RP.TOP_CONC
    hhis = [r.hhi_bp for r in rows]
    assert hhis == sorted(hhis, reverse=True)  # most-concentrated first
    for r in rows:
        # HHI of n equal shares ~ 10000/n; max share bounds it above
        assert 10000 // r.n_supp <= r.hhi_bp <= 10000
        assert r.top_share_bp * r.top_share_bp // 10000 <= r.hhi_bp
        assert r.n_supp >= 1 and r.rev_cents > 0


def test_segment_brand_affinity_marginals(spark):
    rows = RP.segment_brand_affinity(spark, SF_DIR).collect()
    assert rows
    grand = sum(r.n_lines for r in rows)
    by_seg: dict = {}
    by_brand: dict = {}
    for r in rows:
        by_seg[r.c_mktsegment] = by_seg.get(r.c_mktsegment, 0) + r.n_lines
        by_brand[r.p_brand] = by_brand.get(r.p_brand, 0) + r.n_lines
    for r in rows:
        assert r.seg_total == by_seg[r.c_mktsegment]
        assert r.brand_total == by_brand[r.p_brand]
        assert r.lift_e6 == r.n_lines * grand * 1_000_000 // (
            r.seg_total * r.brand_total
        )
    # lift averages to ~1 when weighted by the independence baseline
    assert any(r.lift_e6 > 1_000_000 for r in rows)
    assert any(r.lift_e6 < 1_000_000 for r in rows)


# ---- batch 4: sketch algebra + embedding drift ----

from ensembl_lakehouse_spark.operators import similarity as SIM  # noqa: E402


def test_sketch_kmv_union_algebra(spark):
    rows = R.sketch_kmv_union(spark, SF_DIR).collect()
    types = set()
    for r in rows:
        types |= {r.ta, r.tb}
        assert r.ta < r.tb
        # inclusion-exclusion identities on the exact side
        assert r.exact_union == r.exact_a + r.exact_b - r.exact_inter
        assert r.exact_inter <= min(r.exact_a, r.exact_b)
        assert r.exact_union >= max(r.exact_a, r.exact_b)
        # estimates land within the ~1/sqrt(k) band (generous x3)
        assert abs(r.est_union - r.exact_union) / r.exact_union < 0.5
    n = len(types)
    assert len(rows) == n * (n - 1) // 2


def test_embedding_batch_drift_consistency(spark):
    import duckdb as dd

    rows = {r.dim: r for r in SIM.embedding_batch_drift(spark, SF_DIR).collect()}
    n_vecs = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'")
    dims = duckdb_scalar(
        f"SELECT MAX(len(embedding)) FROM '{SF_DIR}/embeddings.parquet'"
    )
    assert set(rows) == set(range(dims))
    for r in rows.values():
        assert r.n_a + r.n_b == n_vecs
        assert r.drift_fp == abs(r.mean_a_fp - r.mean_b_fp)
        assert r.var_a_fp >= 0 and r.var_b_fp >= 0
    # the two halves of one corpus must NOT drift materially: the
    # audit's null case reads near zero (fixed-point scale 1e6)
    from ensembl_lakehouse_spark.operators.multimodal import FP_SCALE

    assert max(r.drift_fp for r in rows.values()) < FP_SCALE // 10


# ---- batch 5: session shapes, mix drift, catalog semantics ----


def test_session_length_histogram_conserves_events(spark):
    rows = {r.band: r for r in R.session_length_histogram(spark, SF_DIR).collect()}
    n_events = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    assert sum(r.events for r in rows.values()) == n_events
    for r in rows.values():
        assert r.n_sessions > 0
        assert 0 <= r.mean_dur_e3 <= r.max_dur_s * 1000
        if r.band == "a_bounce":
            assert r.events == r.n_sessions  # 1 event per bounce
            assert r.max_dur_s == 0


def test_events_type_share_drift_bounds(spark):
    rows = sorted(R.events_type_share_drift(spark, SF_DIR).collect(), key=lambda r: r.week)
    assert rows
    weeks = [r.week for r in rows]
    assert len(set(weeks)) == len(weeks)
    for r in rows:
        # L1 distance between two share vectors is at most 2 (=20000 bp)
        assert 0 <= r.l1_drift_bp <= 20000
        assert r.n_types >= 1 and r.n_events > 0


def test_part_name_price_lift_is_calibrated(spark):
    rows = RP.part_name_price_lift(spark, SF_DIR).collect()
    assert rows
    lifts = [r.lift_bp for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.n_parts >= RP.NAME_TERM_MIN_SUPPORT
        assert r.mean_cents > 0
    # lift is centered: some terms above, some below the catalog avg
    assert lifts[0] >= 10000 >= lifts[-1]


def test_balance_activity_corr_moment_identities(spark):
    rows = {r.c_mktsegment: r for r in RP.balance_activity_corr(spark, SF_DIR).collect()}
    assert rows
    n_cust = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'")
    assert sum(r.n for r in rows.values()) == n_cust  # spine = customers
    n_orders = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    assert sum(r.sy for r in rows.values()) == n_orders  # Σy = orders
    for r in rows.values():
        assert -1_000_000 <= r.corr_e6 <= 1_000_000


def test_events_type_share_drift_counts_appearing_and_vanishing_types(
    spark, tmp_path
):
    """r7 code review: a full mix inversion (week w-1 all type A,
    week w all type B) must read as MAXIMUM drift (20000 bp), not as
    an absent row — the dense zero-filled grid guarantees it."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 4)  # within one epoch-week
    for i in range(10):
        rows.append((i, base + dt.timedelta(minutes=i), 1, "A", 1.0, "{}"))
    for i in range(10):
        rows.append(
            (100 + i, base + dt.timedelta(days=7, minutes=i), 1, "B", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "lake")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = R.events_type_share_drift(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.l1_drift_bp == 20000  # |0-10000| + |10000-0|
    assert r.n_types == 2 and r.n_events == 10


# ---- batch 6: quantile drift, conversion latency, revenue bridge ----


def test_events_weekly_quantiles_shape(spark):
    rows = sorted(R.events_weekly_quantiles(spark, SF_DIR).collect(), key=lambda r: r.week)
    assert rows
    n_events = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    assert sum(r.n_events for r in rows) == n_events
    assert rows[0].p95_delta is None  # first week has no prior
    for r in rows:
        assert r.p50_value <= r.p95_value
    for a, b in zip(rows, rows[1:]):
        assert b.p95_delta == b.p95_value - a.p95_value


def test_funnel_latency_quartiles_identities(spark):
    r = R.funnel_latency_quartiles(spark, SF_DIR).collect()[0]
    assert 0 < r.n_converted <= r.n_signup_users
    assert r.conv_bp == r.n_converted * 10000 // r.n_signup_users
    assert 0 <= r.p25_delay_s <= r.p50_delay_s <= r.p75_delay_s
    n_signup_users = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'signup'"
    )
    assert r.n_signup_users == n_signup_users


def test_revenue_bridge_identity_is_exact(spark):
    rows = sorted(RP.revenue_bridge(spark, SF_DIR).collect(), key=lambda r: r.yr)
    assert rows
    for r in rows:
        # the decomposition identity holds EXACTLY by construction
        assert (
            r.volume_effect + r.price_effect + r.residual
            == r.rev_cents - r.prev_rev
        )
        # residual is the interaction + truncation term: small
        # relative to revenue
        assert abs(r.residual) < max(abs(r.rev_cents), abs(r.prev_rev))


# ---- batch 7: payload sizing + fact shape ----

from ensembl_lakehouse_spark.operators import multimodal as MM  # noqa: E402


def test_multimodal_size_histogram_conserves_bytes(spark):
    rows = MM.multimodal_size_histogram(spark, SF_DIR).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    )
    total_bytes = sum(r.bytes for r in rows)
    assert total_bytes == duckdb_scalar(
        f"SELECT SUM(octet_length(encode(text))) "
        f"FROM '{SF_DIR}/documents.parquet'"
    )
    for r in rows:
        assert 0 < r.min_bytes <= r.max_bytes
        assert 0 <= r.lang_share_bp <= 10000
    # per-lang shares sum to ~100 %
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, 0)
        by_lang[r.lang] += r.lang_share_bp
    assert all(9990 <= v <= 10000 for v in by_lang.values())


def test_order_width_histogram_conserves_lines_and_revenue(spark):
    rows = {r.band: r for r in R.order_width_histogram(spark, SF_DIR).collect()}
    assert sum(r.n_orders for r in rows.values()) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert sum(r.lines for r in rows.values()) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert 9990 <= sum(r.order_share_bp for r in rows.values()) <= 10000
    for r in rows.values():
        assert r.lines >= r.n_orders  # every order has >= 1 line
