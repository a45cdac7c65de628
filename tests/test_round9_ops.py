"""Semantic pins for the round-9 batch-6 operators — value-level
properties the oracle hash can't express (conservation, bounds,
ordering identities)."""

from __future__ import annotations

import duckdb

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import reports as RP
from tests.conftest import SF_DIR, duckdb_scalar


def test_order_line_dominance_conserves_orders(spark):
    rows = RP.order_line_dominance(spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
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
    assert sum(r.n_customers for r in rows) == duckdb_scalar(
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
    n_orders = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    n_custs = duckdb_scalar(
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
        # ×4 fixed-point: iqr truncates ONCE, q3-q1 truncate twice —
        # they can differ by 1 (r9 code review; the r8 twin pins the
        # same band)
        assert abs(r.iqr_cents - (r.q3_cents - r.q1_cents)) <= 1


def test_retention_by_first_type_covers_every_user(spark):
    rows = R.events_retention_by_first_type(spark, SF_DIR).collect()
    assert sum(r.cohort_users for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 0 <= r.retained_week1 <= r.cohort_users
        assert 0 <= r.retention_bp <= 10000


def test_user_first_day_value_covers_every_user(spark):
    rows = R.user_first_day_value(spark, SF_DIR).collect()
    assert sum(r.cohort_users for r in rows) == duckdb_scalar(
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


def test_word_length_profile_conserves_tokens(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.text_word_length_profile(spark, SF_DIR).collect()
    total = duckdb_scalar(
        f"SELECT SUM(len(string_split_regex(trim(text), '\\s+'))) "
        f"FROM '{SF_DIR}/documents.parquet' WHERE length(trim(text)) > 0"
    )
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 1 <= r.tok_len <= 15
        assert r.vocab <= r.n_tokens


def test_vocab_spectrum_sums_to_vocab(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.vocab_frequency_spectrum(spark, SF_DIR).collect()
    by_source: dict = {}
    for r in rows:
        assert 1 <= r.freq_class <= 6
        by_source[r.source] = by_source.get(r.source, 0) + r.n_terms
    vocab = dict(
        duckdb.sql(
            f"SELECT source, COUNT(DISTINCT tok) FROM ("
            f"SELECT source, unnest(string_split_regex(trim(text), '\\s+'))"
            f" AS tok FROM '{SF_DIR}/documents.parquet'"
            f" WHERE length(trim(text)) > 0) GROUP BY 1"
        ).fetchall()
    )
    assert by_source == vocab


def test_boilerplate_suffix_counts_docs_once(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.boilerplate_suffix_rate(spark, SF_DIR).collect()
    n_docs = duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        f"WHERE length(trim(text)) > 0"
    )
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.boilerplate_docs <= r.n_docs
        assert r.n_suffixes <= r.n_docs


def test_quality_length_matrix_matches_text_quality(spark):
    """The matrix's keep counts must reconstruct text_quality's
    verdicts exactly — same composite, same threshold."""
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.quality_length_matrix(spark, SF_DIR).collect()
    keeps = sum(r.n_keep for r in rows)
    verdicts = (
        T.text_quality(spark, SF_DIR)
        .where("verdict = 'keep'")
        .count()
    )
    assert keeps == verdicts
    for r in rows:
        assert 0 <= r.score_band <= 9
        assert 0 <= r.n_keep <= r.n_docs
        # score >= 0.5 iff band >= 5: bands 0-4 keep nothing,
        # bands 5-9 keep everything
        if r.score_band <= 4:
            assert r.n_keep == 0
        else:
            assert r.n_keep == r.n_docs


def test_norm_label_matrix_shares(spark):
    from ensembl_lakehouse_spark.operators import similarity as S

    rows = S.embedding_norm_label_matrix(spark, SF_DIR).collect()
    n_vecs = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'")
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r.norm_band <= 12
        assert r.min_norm <= r.max_norm
        # band edges: min/max norms live inside the band (cap at 12)
        if r.norm_band < 12:
            assert r.norm_band <= r.min_norm * 4 < r.norm_band + 1


def test_linestatus_mix_conserves_lines(spark):
    rows = RP.linestatus_mix_monthly(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    months: dict = {}
    for r in rows:
        months.setdefault(r.month, 0)
        months[r.month] += r.n_lines
    for r in rows:
        assert r.month_share_bp == r.n_lines * 10000 // months[r.month]


def test_brand_repeat_buyers_bounds(spark):
    for r in RP.brand_repeat_buyers(spark, SF_DIR).collect():
        assert 0 <= r.repeat_buyers <= r.buyers
        assert r.brand_orders >= r.buyers
        assert r.orders_per_buyer_x100 >= 100


def test_customer_value_trend_covers_repeat_customers(spark):
    rows = RP.customer_value_trend_bands(spark, SF_DIR).collect()
    repeaters = duckdb_scalar(
        f"SELECT COUNT(*) FROM (SELECT o_custkey FROM "
        f"'{SF_DIR}/orders.parquet' GROUP BY 1 HAVING COUNT(*) >= 2)"
    )
    assert sum(r.n_customers for r in rows) == repeaters
    assert {r.trend for r in rows} <= {"growing", "flat", "declining"}


def test_customer_spend_lorenz_is_monotone_convex(spark):
    rows = sorted(
        RP.customer_spend_lorenz(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # deciles are ordered by spend: per-customer average revenue is
    # non-decreasing, cumulative share is monotone and ends at ~100%
    avgs = [r.revenue_cents / r.n_customers for r in rows]
    assert all(a <= b for a, b in zip(avgs, avgs[1:]))
    shares = [r.cum_share_bp for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 10000
    # exact-NTILE sizing: bucket sizes differ by at most 1
    sizes = {r.n_customers for r in rows}
    assert max(sizes) - min(sizes) <= 1


def test_session_conversion_agrees_with_sessionize(spark):
    from ensembl_lakehouse_spark.operators import relational as R2

    rows = R2.session_conversion_rate(spark, SF_DIR).collect()
    n_sessions = (
        R2.events_sessionize(spark, SF_DIR).count()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.converted_sessions <= r.n_sessions


def test_type_cooccurrence_lift_identities(spark):
    from ensembl_lakehouse_spark.operators import relational as R2

    rows = R2.type_cooccurrence_lift(spark, SF_DIR).collect()
    n_types = duckdb_scalar(
        f"SELECT COUNT(DISTINCT event_type) FROM '{SF_DIR}/events.parquet'"
    )
    # inner-join contract: only pairs sharing >= 1 user emit a row
    assert 0 < len(rows) <= n_types * (n_types - 1) // 2
    n_users = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert r.ta < r.tb
        assert r.co_users <= min(r.users_a, r.users_b)
        # inclusion bound: can't co-occur more than the universe allows
        assert r.co_users >= max(0, r.users_a + r.users_b - n_users)
        assert r.lift_bp == (
            r.co_users * n_users * 10000
        ) // (r.users_a * r.users_b)


def test_error_rate_hourly_conserves(spark):
    from ensembl_lakehouse_spark.operators import relational as R2

    rows = R2.events_error_rate_hourly(spark, SF_DIR).collect()
    assert sum(r.n_events for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    )
    assert sum(r.n_errors for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet' "
        f"WHERE event_type = 'error'"
    )
    for r in rows:
        assert 0 <= r.error_rate_bp <= 10000


def test_session_bands_agree_with_sessionize(spark):
    from ensembl_lakehouse_spark.operators import relational as R2

    rows = R2.user_session_count_bands(spark, SF_DIR).collect()
    assert sum(r.n_users for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    n_sessions = R2.events_sessionize(spark, SF_DIR).count()
    assert sum(r.total_sessions for r in rows) == n_sessions
    for r in rows:
        assert r.avg_depth_x100 >= 100


def test_nation_ratio_shares_and_totals(spark):
    rows = RP.nation_customer_supplier_ratio(spark, SF_DIR).collect()
    n_cust = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'")
    n_supp = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/supplier.parquet'")
    # inner join: only nations with BOTH sides — totals bound above
    assert sum(r.n_customers for r in rows) <= n_cust
    assert sum(r.n_suppliers for r in rows) <= n_supp
    for r in rows:
        assert r.cust_per_supp_x100 == r.n_customers * 100 // r.n_suppliers


def test_tax_discount_grid_conserves_lines(spark):
    rows = RP.tax_discount_grid(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        # take = gross*(1-d)*(1+t): discount <= 10%, tax <= 8% in
        # TPC-H ranges, so the rate lives in a sane band either side
        # of par
        assert 8000 <= r.take_rate_bp <= 11000


def test_numeric_token_rate_bounds(spark):
    from ensembl_lakehouse_spark.operators import text as T2

    for r in T2.numeric_token_rate(spark, SF_DIR).collect():
        # pure-digit tokens are a subset of digit-bearing tokens
        assert r.numeric_tokens <= r.digit_tokens <= r.n_tokens
        assert r.numeric_vocab <= r.numeric_tokens or r.numeric_tokens == 0


def test_embedding_peakiness_covers_nonzero_vectors(spark):
    from ensembl_lakehouse_spark.operators import similarity as S2

    rows = S2.embedding_peakiness(spark, SF_DIR).collect()
    n_vecs = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'")
    assert 0 < sum(r.n_vectors for r in rows) <= n_vecs
    for r in rows:
        # max component share of L1 is at least 1/dim and at most 1
        assert 0 <= r.peak_band <= 19
