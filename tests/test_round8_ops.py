"""Semantic pins for the round-8 operator batch — value-level
properties the oracle hash can't express (conservation, bounds,
identities, the reflected-walk recurrence, KMV error behavior)."""

from __future__ import annotations

import duckdb

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import reports as RP
from ensembl_lakehouse_spark.operators import similarity as S
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR, duckdb_scalar


def test_events_hourly_heatmap_covers_all_events(spark):
    rows = R.events_hourly_heatmap(spark, SF_DIR).collect()
    assert sum(r.n_events for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23
        assert 0 <= r.share_bp <= 10000
    # each dow's rank-1 row is its max
    for d in {r.dow for r in rows}:
        day = [r for r in rows if r.dow == d]
        top = next(r for r in day if r.dow_rank == 1)
        assert top.n_events == max(r.n_events for r in day)


def test_weekly_active_users_identities(spark):
    rows = sorted(
        R.weekly_active_users(spark, SF_DIR).collect(), key=lambda r: r.week
    )
    assert rows[0].wow_bp is None  # no predecessor week
    total_users = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 0 < r.wau <= total_users
        assert r.events_per_user == r.n_events // r.wau
    import math

    for prev, cur in zip(rows, rows[1:]):
        # floor of the DOUBLE ratio — the operator's actual contract
        # (truncating DIV would differ on negative growth)
        want = math.floor((cur.wau - prev.wau) * 10000 / prev.wau)
        assert cur.wow_bp == want


def test_user_burstiness_bounds(spark):
    rows = R.user_burstiness(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20  # min(20, |users|) at this SF
    bps = [r.burst_bp for r in rows]
    assert bps == sorted(bps, reverse=True)
    for r in rows:
        # peak·hours ≥ total ⇒ ratio ≥ 10000 − (integer truncation)
        assert r.burst_bp >= 10000 - 1
        assert r.peak_hour_events <= r.total_events
        assert r.active_hours <= r.total_events


def test_events_value_drift_is_bounded_and_dense(spark):
    rows = R.events_value_drift(spark, SF_DIR).collect()
    types = duckdb_scalar(
        f"SELECT COUNT(DISTINCT event_type) FROM '{SF_DIR}/events.parquet'"
    )
    assert len(rows) == types  # every type scored, even drift-free
    for r in rows:
        assert 0 <= r.tv_bp <= 10000
        assert 0 <= r.worst_band_gap_bp <= 10000
        assert r.worst_band_gap_bp <= 2 * r.tv_bp + 1  # TV = Σgaps/2


def test_orders_interarrival_histogram_conserves_gaps(spark):
    rows = R.orders_interarrival_histogram(spark, SF_DIR).collect()
    n_orders = duckdb_scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'")
    n_cust = duckdb_scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    edges = {0: (0, 7), 1: (8, 14), 2: (15, 28), 3: (29, 56),
             4: (57, 112)}
    for r in rows:
        if r.band in edges:
            lo, hi = edges[r.band]
            assert lo <= r.min_days and r.max_days <= hi
        else:
            assert r.min_days >= 113


def test_sketch_kmv_rollup_read_error_is_small(spark):
    rows = R.sketch_kmv_rollup_read(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.est_users > 0
        # k=48 ⇒ ~1/√48 ≈ 14 % expected error; allow 3× headroom
        assert r.err_bp <= 4500, (r.event_type, r.err_bp)


def test_user_type_gini_identities(spark):
    rows = R.user_type_gini(spark, SF_DIR).collect()
    assert len(rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 0 <= r.gini_bp < 10000
        if r.n_types == 1:
            assert r.gini_bp == 0 and r.top_share_bp == 10000
        assert r.top_share_bp * r.n_types >= 10000 - r.n_types  # max ≥ mean


def test_calendar_adjusted_monthly_index_identities(spark):
    rows = RP.calendar_adjusted_monthly_index(spark, SF_DIR).collect()
    assert len(rows) == 12
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    )
    for r in rows:
        assert r.rev_per_day == r.rev_cents // r.days
        # pooled Feb has fewer days than pooled Jul
    feb = next(r for r in rows if r.mon == 2)
    jul = next(r for r in rows if r.mon == 7)
    assert feb.days < jul.days


def test_inventory_backorder_sim_matches_sequential_model(spark):
    """The reflected-walk identity against a plain Python loop —
    the sequential recurrence the distributive form must equal."""
    rows = {r.p_type: r for r in
            RP.inventory_backorder_sim(spark, SF_DIR).collect()}
    demand = duckdb.sql(
        f"""SELECT p.p_type,
                   CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS wk,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
            FROM '{SF_DIR}/lineitem.parquet' l
            JOIN '{SF_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    by_type: dict = {}
    for t, wk, d in demand:
        by_type.setdefault(t, []).append(d)
    for t, ds in by_type.items():
        r = rows[t]
        rate = sum(ds) // len(ds) + 1
        assert r.restock_per_week == rate and r.n_weeks == len(ds)
        stock, stockouts, deficit = 0, 0, 0
        for d in ds:
            stock = stock + rate - d
            if stock < 0:
                stockouts += 1
                deficit = max(deficit, -stock)
                stock = 0
        assert r.end_stock == stock, t
        assert r.stockout_weeks == stockouts, t
        assert r.max_deficit == deficit, t


def test_reorder_point_dominates_typical_demand(spark):
    for r in RP.reorder_point_report(spark, SF_DIR).collect():
        assert r.reorder_point >= r.typical_demand
        assert r.safety_stock == r.reorder_point - r.typical_demand
        assert r.typical_demand <= r.total_demand


def test_customer_ltv_cohorts_identities(spark):
    rows = RP.customer_ltv_cohorts(spark, SF_DIR).collect()
    # offset-0 row exists for every cohort and counts every member's
    # first order; cumulative is nondecreasing in age
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    n_cust = duckdb_scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    assert sum(
        rs[0].cohort_size for rs in
        (sorted(v, key=lambda r: r.age_months) for v in by_cohort.values())
    ) == n_cust
    total_cents = duckdb_scalar(
        "SELECT SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/orders.parquet'"
    )
    assert sum(r.rev_cents for r in rows) == total_cents
    for v in by_cohort.values():
        v = sorted(v, key=lambda r: r.age_months)
        assert v[0].age_months == 0
        assert v[0].active_customers == v[0].cohort_size
        cums = [r.cum_rev_cents for r in v]
        assert cums == sorted(cums)
        for r in v:
            assert r.ltv_cents == r.cum_rev_cents // r.cohort_size


def test_cohort_repeat_rate_bounds(spark):
    rows = RP.cohort_repeat_rate(spark, SF_DIR).collect()
    assert sum(r.cohort_size for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    for r in rows:
        assert 0 <= r.repeaters_6m <= r.cohort_size
        assert r.repeat_bp == r.repeaters_6m * 10000 // r.cohort_size


def test_nation_trade_balance_conserves_both_sides(spark):
    rows = RP.nation_trade_balance(spark, SF_DIR).collect()
    assert len(rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/nation.parquet'"
    )
    assert sum(r.consumed_cents for r in rows) == duckdb_scalar(
        "SELECT SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/orders.parquet'"
    )
    ranks = sorted(r.net_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.net_cents == r.supplied_cents - r.consumed_cents


def test_parts_pareto_concentration_bounds(spark):
    for r in RP.parts_pareto_concentration(spark, SF_DIR).collect():
        assert 1 <= r.parts_to_80pct <= r.n_parts
        assert 0 < r.top_part_share_bp <= 10000
        assert 0 < r.pareto_bp <= 10000


def test_part_brand_price_dispersion_order(spark):
    for r in RP.part_brand_price_dispersion(spark, SF_DIR).collect():
        assert r.min_cents <= r.median_cents <= r.max_cents
        assert 0 <= r.iqr_cents <= r.max_cents - r.min_cents


def test_orders_priority_mix_grid_is_dense_and_sums(spark):
    rows = RP.orders_priority_mix_by_month(spark, SF_DIR).collect()
    months = {r.mon for r in rows}
    prios = {r.o_orderpriority for r in rows}
    assert len(rows) == len(months) * len(prios)  # dense grid
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    )
    for m in months:
        assert 9995 <= sum(
            r.share_bp for r in rows if r.mon == m
        ) <= 10000  # integer-DIV undershoot only


def test_lineitem_discount_effectiveness_conserves(spark):
    rows = RP.lineitem_discount_effectiveness(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        assert 0 <= r.disc_pct <= 10
        assert r.avg_qty_x100 == r.total_qty * 100 // r.n_lines


def test_supplier_balance_deciles_partition(spark):
    rows = sorted(
        RP.supplier_balance_deciles(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_suppliers for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/supplier.parquet'"
    )
    # deciles are ordered ranges
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents


def test_contamination_matrix_complete_and_bounded(spark):
    rows = T.contamination_matrix(spark, SF_DIR).collect()
    sources = duckdb_scalar(
        f"SELECT COUNT(DISTINCT source) FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    )
    # pairs with zero shared grams drop out of the inner join
    assert len(rows) <= sources * (sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.shared_grams <= min(r.grams_a, r.grams_b)
        assert 0 < r.containment_ppm <= 1_000_000


def test_text_char_class_profile_shares_bounded(spark):
    rows = T.text_char_class_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.digit_bp + r.upper_bp + r.symbol_bp <= 10000
        assert r.chars > 0 and r.n_docs > 0


def test_doc_length_mad_outliers_matches_python(spark):
    import statistics

    rows = {r.lang: r for r in
            T.doc_length_mad_outliers(spark, SF_DIR).collect()}
    data = duckdb.sql(
        f"SELECT lang, n_chars FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchall()
    by_lang: dict = {}
    for lang, n in data:
        by_lang.setdefault(lang, []).append(n)
    for lang, xs in by_lang.items():
        r = rows[lang]
        med2 = int(statistics.median([x * 2 for x in xs]))
        mad4 = int(statistics.median([abs(x * 2 - med2) * 2 for x in xs]))
        outliers = sum(1 for x in xs if abs(x * 2 - med2) * 2 > 3 * mad4)
        assert r.median_chars == med2 // 2, lang
        assert r.mad_chars == mad4 // 4, lang
        assert r.n_outliers == outliers, lang


def test_embedding_label_separation_is_a_metric_sample(spark):
    rows = S.embedding_label_separation(spark, SF_DIR).collect()
    labels = duckdb_scalar(
        f"SELECT COUNT(DISTINCT label) FROM '{SF_DIR}/embeddings.parquet'"
    )
    assert len(rows) == labels * (labels - 1) // 2  # complete matrix
    for r in rows:
        assert r.label_a < r.label_b
        assert 0 <= r.max_dim_gap_fp <= r.l1_fp
        assert r.n_a > 0 and r.n_b > 0


# --- batch 6 ---------------------------------------------------------


def test_customer_balance_spend_matrix_is_square(spark):
    rows = RP.customer_balance_spend_matrix(spark, SF_DIR).collect()
    n_cust = duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'"
    )
    assert sum(r.n_customers for r in rows) == n_cust  # incl. no-order
    for axis in ("bal_q", "spend_q"):
        marg: dict = {}
        for r in rows:
            marg[r[axis]] = marg.get(r[axis], 0) + r.n_customers
        # NTILE(5) margins are equal ±1
        assert max(marg.values()) - min(marg.values()) <= 1, (axis, marg)


def test_part_type_brand_matrix_shares_sum(spark):
    rows = RP.part_type_brand_matrix(spark, SF_DIR).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.p_type, []).append(r.share_of_type_bp)
        assert r.lift_bp > 0
    for t, shares in by_type.items():
        assert 10000 - len(shares) <= sum(shares) <= 10000, t


def test_supplier_part_coverage_bounds(spark):
    rows = RP.supplier_part_coverage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_types <= r.n_parts <= r.n_lines
        assert 0 < r.type_coverage_bp <= 10000


def test_user_retention_curve_monotone_from_full(spark):
    rows = R.user_retention_curve(spark, SF_DIR).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    total = duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    assert sum(
        sorted(v, key=lambda r: r.week_offset)[0].cohort_size
        for v in by_cohort.values()
    ) == total
    for v in by_cohort.values():
        v = sorted(v, key=lambda r: r.week_offset)
        assert v[0].week_offset == 0 and v[0].retention_bp == 10000
        for r in v:
            assert 0 < r.retention_bp <= 10000


def test_events_type_value_quartiles_ordered(spark):
    for r in events_q(spark):
        assert r.q1_cents <= r.median_cents <= r.q3_cents
        # iqr = (q3_x4 - q1_x4) DIV 4 truncates ONCE, the displayed
        # quartiles truncate separately — they may differ by 1 cent
        # (floor((a-b)/4) vs floor(a/4)-floor(b/4); r8 review found
        # the exact-equality form fails on sf0.01 data)
        assert abs(r.iqr_cents - (r.q3_cents - r.q1_cents)) <= 1


def events_q(spark):
    return R.events_type_value_quartiles(spark, SF_DIR).collect()


def test_doc_token_length_profile_shares(spark):
    rows = T.doc_token_length_profile(spark, SF_DIR).collect()
    by_lang: dict = {}
    for r in rows:
        assert 0 <= r.band <= 4
        by_lang.setdefault(r.lang, 0)
        by_lang[r.lang] += r.share_bp
    for lang, s in by_lang.items():
        assert 9995 <= s <= 10000, (lang, s)


def test_source_vocab_gini_matches_python(spark):
    rows = {r.source: r for r in
            T.source_vocab_gini(spark, SF_DIR).collect()}
    data = duckdb.sql(
        "SELECT source, unnest(string_split_regex(trim(text), '\\s+')) "
        f"AS tok FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchall()
    from collections import Counter
    by_src: dict = {}
    for src, tok in data:
        by_src.setdefault(src, Counter())[tok] += 1
    for src, cnt in by_src.items():
        total = sum(cnt.values())
        shares = [n * 1_000_000 // total for n in cnt.values()]
        gini = 1_000_000 - sum(x * x for x in shares) // 1_000_000
        r = rows[src]
        assert r.vocab == len(cnt) and r.n_tokens == total
        assert r.gini_ppm == gini, src
        assert r.top_token_ppm == max(shares)
