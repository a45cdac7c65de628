"""Semantic pins for the round-6 governance/retention pack —
value-level properties the oracle hash can't express (cross-run
determinism, conservation, parameter response)."""

from __future__ import annotations

from ensembl_lakehouse_spark.operators import governance as GV
from tests.conftest import SF_DIR


def test_retention_audit_conserves_rows_and_responds_to_window(spark):
    rows = {r.event_type: r for r in GV.retention_audit(spark, SF_DIR).collect()}
    total = sum(r.expired_rows + r.kept_rows for r in rows.values())
    import duckdb

    assert total == duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    for r in rows.values():
        assert 0 <= r.expired_share_bp <= 10000
    # a zero-day window expires everything except the anchor second
    harsh = {
        r.event_type: r
        for r in GV.retention_audit(spark, SF_DIR, retention_days=0).collect()
    }
    assert sum(r.expired_rows for r in harsh.values()) >= sum(
        r.expired_rows for r in rows.values()
    )


def test_tombstone_cascade_bounds(spark):
    for r in GV.tombstone_cascade(spark, SF_DIR).collect():
        assert 0 <= r.docs_tombstoned <= r.docs_total
        # every cascade row is keyed by a tombstoned doc
        assert r.embeddings_cascade <= r.docs_tombstoned
        if r.docs_tombstoned:
            assert r.chars_erased > 0


def test_kfold_assign_is_deterministic_and_complete(spark):
    a = sorted(map(tuple, GV.kfold_assign(spark, SF_DIR).collect()))
    b = sorted(map(tuple, GV.kfold_assign(spark, SF_DIR).collect()))
    assert a == b  # no RNG anywhere
    total = sum(r[2] for r in a)
    import duckdb

    assert total == duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    folds = {r[1] for r in a}
    assert folds <= set(range(GV.KFOLDS))
    # fold counts respond to the parameter
    three = GV.kfold_assign(spark, SF_DIR, folds=3).collect()
    assert {r.fold for r in three} <= {0, 1, 2}


def test_attribution_excludes_conversion_itself(spark):
    # a user whose FIRST event is the purchase contributes no row, so
    # total attributed users <= users with a purchase
    import duckdb

    with_purchase = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    out = GV.attribution_first_last(spark, SF_DIR).collect()
    assert sum(r.n_users for r in out) <= with_purchase
    # last_touch can never be the conversion purchase when the user's
    # only purchase IS the conversion — but purchases before a later
    # first-purchase can't exist by definition, so no first_touch or
    # last_touch may be 'purchase' for single-purchase users; combos
    # involving 'purchase' require >=2 purchases where an earlier one
    # precedes... impossible (conv is the FIRST purchase), so NO touch
    # is ever 'purchase'.
    for r in out:
        assert r.first_touch != "purchase" and r.last_touch != "purchase"


def test_subject_access_report_ranking_and_names(spark):
    out = GV.subject_access_report(spark, SF_DIR, top_n=10).collect()
    assert len(out) == 10
    feet = [r.footprint_rows for r in out]
    assert feet == sorted(feet, reverse=True)
    for r in out:
        assert r.footprint_rows == r.orders_rows + r.lineitem_rows
        assert r.c_name is not None
        assert r.first_order <= r.last_order


def test_events_user_gaps_sanity(spark):
    for r in GV.events_user_gaps(spark, SF_DIR).collect():
        assert r.n_gaps == r.n_events - 1
        if r.n_gaps:
            assert r.mean_gap_s <= r.max_gap_s
            assert r.max_gap_s >= 0


def test_term_exposure_rejects_regex_terms(spark):
    import pytest

    with pytest.raises(ValueError, match="plain words"):
        GV.term_exposure_scan(spark, SF_DIR, terms=("a.*b",))


def test_session_concurrency_two_phase_equals_day_partitioned(spark):
    """The bucket-carry rewrite (no task sorts more than one hour of
    one day) must equal the day-partitioned sweep exactly — the
    oracle form for both."""
    from ensembl_lakehouse_spark.operators import relational as R

    base = sorted(map(tuple, R.session_concurrency(spark, SF_DIR).collect()))
    two = sorted(
        map(tuple, R.session_concurrency(spark, SF_DIR, two_phase=True).collect())
    )
    assert base == two
    # and under a different gap parameter too
    base5 = sorted(
        map(tuple, R.session_concurrency(spark, SF_DIR, gap_minutes=5).collect())
    )
    two5 = sorted(
        map(
            tuple,
            R.session_concurrency(
                spark, SF_DIR, gap_minutes=5, two_phase=True
            ).collect(),
        )
    )
    assert base5 == two5


def test_vocab_growth_is_monotone_and_conserves_vocab(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.vocab_growth_curve(spark, SF_DIR).collect()
    cums = [r.cum_vocab for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r.new_terms for r in rows)
    # first bucket introduces its entire vocabulary
    assert rows[0].new_terms == rows[0].cum_vocab > 0


def test_graph_reciprocity_bounds(spark):
    from ensembl_lakehouse_spark.operators import graph as G

    for r in G.graph_reciprocity(spark, SF_DIR).collect():
        assert 0 <= r.reciprocated <= r.out_edges
        assert 0 <= r.reciprocity_bp <= 10000


def test_discount_band_shares_sum_to_total(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.discount_band_lift(spark, SF_DIR).collect()
    # integer-DIV shares undershoot: sum in (10000 - |bands|, 10000]
    s = sum(r.revenue_share_bp for r in rows)
    assert 10000 - len(rows) < s <= 10000


def test_label_centroid_separation_is_symmetric_complete(spark):
    from ensembl_lakehouse_spark.operators import similarity as S

    rows = S.label_centroid_separation(spark, SF_DIR).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2  # every unordered pair once
    for r in rows:
        assert r.label_a < r.label_b and r.n_a > 0 and r.n_b > 0


def test_session_concurrency_two_phase_midnight_crossing(spark, tmp_path):
    """Code-review repro: a session clipped at midnight emits its -1
    at t = next-day 00:00 under THIS day's key; bucketing by hour(t)
    sorted that delta before the whole day and corrupted the carry.
    Elapsed-hours bucketing (bucket 24) must reproduce the
    day-partitioned sweep exactly."""
    import datetime as dt

    from ensembl_lakehouse_spark.operators import relational as R

    rows = [
        # user 1: one session 23:50 -> 23:58 (peaks with user 2's)
        (1, dt.datetime(2024, 3, 1, 23, 50), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 3, 1, 23, 58), 1, "click", 1.0, "{}"),
        # user 2: session crossing midnight (23:55 -> 00:05 next day)
        (3, dt.datetime(2024, 3, 1, 23, 55), 2, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 3, 2, 0, 5), 2, "click", 1.0, "{}"),
        # user 3: a lone early session the same day
        (5, dt.datetime(2024, 3, 1, 10, 0), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    d = tmp_path / "fixture"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    base = sorted(map(tuple, R.session_concurrency(spark, str(d)).collect()))
    two = sorted(
        map(tuple, R.session_concurrency(spark, str(d), two_phase=True).collect())
    )
    assert base == two
    peaks = {r[0]: r[2] for r in base}
    assert peaks[dt.date(2024, 3, 1)] == 2  # users 1+2 overlap at 23:55


def test_transition_probs_sum_per_source_type(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_type_transitions(spark, SF_DIR).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.prob_bp)
    for f, probs in by_from.items():
        # integer-DIV undershoot: sum in (10000 - |targets|, 10000]
        assert 10000 - len(probs) < sum(probs) <= 10000, f


def test_embedding_dim_stats_variance_nonnegative(spark):
    from ensembl_lakehouse_spark.operators import similarity as S

    rows = S.embedding_dim_stats(spark, SF_DIR).collect()
    assert len(rows) == 64
    assert all(r.var_fp >= 0 for r in rows)
    assert all(r.n == rows[0].n for r in rows)  # every dim same count


# --- round-6 batch 3 -------------------------------------------------------


def test_events_burstiness_bounds_and_moments(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_burstiness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Cauchy-Schwarz: n·Σc² ≥ (Σc)² ⇒ fano ≥ 0
        assert r.fano_e6 >= 0
        assert r.sum_c2 >= r.sum_c  # counts ≥ 1 per observed hour
        assert r.mean_e3 >= 1000


def test_events_autocorr24_in_pearson_range(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_autocorr24(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1_000_001 <= r.corr_e6 <= 1_000_000
        # moment consistency (Cauchy-Schwarz on the raw sums)
        assert r.n_pairs * r.sxx >= r.sx * r.sx
        assert r.n_pairs * r.syy >= r.sy * r.sy


def test_feature_drift_chi2_row_conservation(spark):
    from ensembl_lakehouse_spark.operators import relational  # noqa: F401
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.feature_drift_chi2(spark, SF_DIR).collect()
    assert rows
    import duckdb

    for p in {r.priority for r in rows}:
        sub = [r for r in rows if r.priority == p]
        # band histograms conserve each year's priority total
        assert sum(r.c_a for r in sub) == sub[0].tot_a
        assert sum(r.c_b for r in sub) == sub[0].tot_b
        for r in sub:
            if r.c_a == 0:
                assert r.chi2_contrib_e6 is None  # new band → NULL signal
            else:
                assert r.chi2_contrib_e6 >= 0
    ya = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' "
        f"WHERE year(o_orderdate) = {RP.DRIFT_YEAR_A}"
    ).fetchone()[0]
    assert sum(r.c_a for r in rows if r.priority == rows[0].priority) <= ya


def test_mix_temperature_weights_flattens_toward_uniform(spark):
    from ensembl_lakehouse_spark.operators import pipeline as P

    rows = P.mix_temperature_weights(spark, SF_DIR).collect()
    assert rows
    # shares are honest basis points (floor ⇒ sum ≤ 10000)
    for col in ("prop_bp", "temp_bp"):
        s = sum(getattr(r, col) for r in rows)
        assert 10000 - len(rows) <= s <= 10000
    # temperature must sit between proportional and uniform on the
    # extremes: the largest source loses share, the smallest gains
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs > small.n_docs:
        assert big.temp_bp <= big.prop_bp
        assert small.temp_bp >= small.prop_bp


def test_text_lexical_gini_bounds(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.text_lexical_gini(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_gini_bp <= r.max_gini_bp < 10000
        assert r.min_gini_bp <= r.mean_gini_bp <= r.max_gini_bp


def test_graph_kcore_peeling_is_monotone(spark):
    from ensembl_lakehouse_spark.operators import graph as G

    rows = G.graph_kcore(spark, SF_DIR).collect()
    assert [r["round"] for r in rows] == [0, 1, 2, 3]
    k = rows[0].k
    for a, b in zip(rows, rows[1:]):
        assert b.k == k  # one adaptive k, fixed across rounds
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    # peeling with a p75 threshold must actually remove something
    assert rows[-1].n_nodes < rows[0].n_nodes


# --- round-6 batch 4 -------------------------------------------------------


def test_discount_quantity_corr_range_and_moments(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.discount_quantity_corr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1_000_001 <= r.corr_e6 <= 1_000_000
        assert r.n > 1


def test_customer_repeat_rate_bounds(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.customer_repeat_rate(spark, SF_DIR).collect()
    assert rows
    import duckdb

    n_ordering = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n_customers for r in rows) == n_ordering
    for r in rows:
        assert 0 <= r.n_repeat <= r.n_customers
        assert 0 <= r.repeat_bp <= 10000
        if r.n_repeat == 0:
            assert r.mean_gap_days is None
        else:
            assert r.mean_gap_days >= 0


def test_supplier_hhi_bounds(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.supplier_hhi(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # floor-share HHI: bounded by the even-split lower bound
        # (minus floor slack) and the monopoly upper bound
        assert r.hhi_bp <= 10000
        assert r.hhi_bp >= 10000 // r.n_suppliers - r.n_suppliers
        if r.n_suppliers == 1:
            assert r.hhi_bp == 10000


def test_events_trigram_paths_consistent_with_transitions(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    tri = R.events_trigram_paths(spark, SF_DIR).collect()
    assert 0 < len(tri) <= R.TRIGRAM_TOP_N
    # top-N ordering is (support DESC, triple ASC)
    sups = [r.support for r in tri]
    assert sups == sorted(sups, reverse=True)
    # every trigram's (a→b) pair must exist in the transition matrix
    pairs = {
        (r.from_type, r.to_type): r.n
        for r in R.events_type_transitions(spark, SF_DIR).collect()
    }
    for r in tri:
        assert pairs.get((r.a, r.b), 0) >= r.support
        assert pairs.get((r.b, r.c), 0) >= r.support


def test_embedding_hubness_conserves_panel_and_edges(spark):
    from ensembl_lakehouse_spark.operators import similarity as S

    rows = S.embedding_hubness(spark, SF_DIR).collect()
    assert rows
    import duckdb

    panel = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet' "
        f"WHERE vec_id < {S.HUB_PANEL}"
    ).fetchone()[0]
    # every panel vector lands in exactly one in-degree bucket
    assert sum(r.n_vectors for r in rows) == panel
    # the kNN graph has exactly panel·k edges, conserved by in-degree
    assert sum(r.in_deg * r.n_vectors for r in rows) == panel * S.HUB_K


# --- round-6 batch 5 -------------------------------------------------------


def test_growth_accounting_identity_and_first_week(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_growth_accounting(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    # first week of the corpus is all-new by definition
    assert rows[0].n_new == rows[0].n_active
    # total new across weeks = distinct users ever active
    import duckdb

    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_new for r in rows) == n_users


def test_backlog_aging_excludes_finalized_and_conserves(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.orders_backlog_aging(spark, SF_DIR).collect()
    assert rows
    assert {r.o_orderstatus for r in rows} <= {"O", "P"}
    import duckdb

    open_n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' "
        "WHERE o_orderstatus <> 'F'"
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == open_n
    for st in {r.o_orderstatus for r in rows}:
        s = sum(r.share_bp for r in rows if r.o_orderstatus == st)
        n = len([r for r in rows if r.o_orderstatus == st])
        assert 10000 - n <= s <= 10000  # floor shares


def test_sentence_stats_bounds(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.text_sentence_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_sentences >= r.n_docs >= 1
        assert r.chars_per_sent_e2 > 0
        assert r.sents_per_doc_e2 >= 100  # ≥1 sentence per doc


def test_cluster_purity_consistent_with_kmeans(spark):
    from ensembl_lakehouse_spark.operators import clustering as K

    purity = {r.cluster: r for r in K.embedding_cluster_purity(spark, SF_DIR).collect()}
    sizes = {r.cluster: r.n_members for r in K.embedding_kmeans(spark, SF_DIR).collect()}
    # same partition of the corpus as the kmeans report
    assert {c: r.n_members for c, r in purity.items()} == sizes
    for r in purity.values():
        # majority share is at least the uniform-label floor
        assert 10000 // 8 <= r.purity_bp <= 10000
        assert 0 <= r.majority_label


# --- round-6 batch 6 -------------------------------------------------------


def test_assortativity_moments_symmetric_and_bounded(spark):
    from ensembl_lakehouse_spark.operators import graph as G

    rows = G.graph_assortativity(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert -1_000_001 <= r.assortativity_e6 <= 1_000_000
    # doubled edge list ⇒ n is even and moments are symmetric by
    # construction (sx == sy was consumed into the output contract)
    assert r.n % 2 == 0 and r.n > 0


def test_nation_trade_lift_marginals(spark):
    from ensembl_lakehouse_spark.operators import graph as G

    rows = G.nation_trade_lift(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_trades for r in rows)
    # volume-weighted mean lift = 10⁴·(1 + φ²) ≥ 10⁴ (equality iff
    # perfectly independent); φ² ≤ min(r,c)−1 = 24 bounds it above.
    # Integer-DIV floor loses < 1bp per row, hence the −total slack.
    wsum = sum(r.n_trades * r.lift_bp for r in rows)
    assert 10000 * total - total <= wsum <= 10000 * total * 25
    for r in rows:
        assert r.lift_bp >= 0


def test_stickiness_bounds_and_window(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_stickiness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau  # a day's actives ⊆ the week's
        assert 0 < r.stickiness_bp <= 10000
    import duckdb

    n_days = duckdb.sql(
        f"SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert len(rows) == n_days - 6  # first 6 days lack a full window


def test_hour_heatmap_conserves_and_shares(spark):
    from ensembl_lakehouse_spark.operators import relational as R

    rows = R.events_hour_heatmap(spark, SF_DIR).collect()
    import duckdb

    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
    for dow in {r.dow for r in rows}:
        cells = [r for r in rows if r.dow == dow]
        s = sum(r.dow_share_bp for r in cells)
        assert 10000 - len(cells) <= s <= 10000


def test_lead_variability_nonnegative_and_ranked(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.supplier_lead_variability(spark, SF_DIR).collect()
    assert 0 < len(rows) <= RP.LEAD_VAR_TOP_N
    vs = [r.var_e2 for r in rows]
    assert vs == sorted(vs, reverse=True)
    for r in rows:
        assert r.var_e2 >= 0 and r.n > 1


# --- round-6 batch 7 -------------------------------------------------------


def test_segment_priority_lift_identity(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.segment_priority_lift(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n for r in rows)
    wsum = sum(r.n * r.lift_bp for r in rows)
    # weighted mean lift = 10⁴(1+φ²) ≥ 10⁴ − floor slack
    assert wsum >= 10000 * total - total
    for r in rows:
        assert r.lift_bp >= 0


def test_region_share_trend_sums_and_deltas(spark):
    from ensembl_lakehouse_spark.operators import reports as RP

    rows = RP.region_revenue_share_trend(spark, SF_DIR).collect()
    assert rows
    years = {r.yr for r in rows}
    for yr in years:
        cells = [r for r in rows if r.yr == yr]
        s = sum(r.share_bp for r in cells)
        assert 10000 - len(cells) <= s <= 10000
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for series in by_region.values():
        series.sort(key=lambda r: r.yr)
        assert series[0].share_delta_bp is None  # no prior year
        for prev, cur in zip(series, series[1:]):
            assert cur.share_delta_bp == cur.share_bp - prev.share_bp


def test_doc_length_gini_corr_range(spark):
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.doc_length_gini_corr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1_000_001 <= r.corr_e6 <= 1_000_000
        assert r.n > 1


def test_cosine_histogram_conserves_pairs(spark):
    from ensembl_lakehouse_spark.operators import similarity as S

    rows = S.embedding_cosine_histogram(spark, SF_DIR).collect()
    assert rows
    import duckdb

    panel = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet' "
        f"WHERE vec_id < {S.HUB_PANEL}"
    ).fetchone()[0]
    assert sum(r.n_pairs for r in rows) == panel * (panel - 1) // 2
    for r in rows:
        # cosine ∈ [-1, 1] ⇒ band ∈ [-20, 20]
        assert -S.COS_HIST_BANDS_PER_UNIT <= r.band <= S.COS_HIST_BANDS_PER_UNIT
        assert r.pair_kind in ("same", "cross")
