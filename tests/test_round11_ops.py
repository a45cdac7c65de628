"""Semantic pins for the round-11 batch-1 operators — value-level
properties the oracle hash can't express (conservation, bounds,
provable identities)."""

from __future__ import annotations

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import reports as RP
from ensembl_lakehouse_spark.operators import similarity as S
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR, duckdb_scalar


def test_fisher_sits_between_laspeyres_and_paasche(spark):
    """Geometric mean: min(L, P) ≤ F ≤ max(L, P) per month, and the
    base month is exactly par on all three."""
    rows = RP.price_index_fisher(spark, SF_DIR).collect()
    base = min(rows, key=lambda r: r.m)
    assert base.lasp_bp == base.paas_bp == base.fisher_bp == 10000
    for r in rows:
        lo, hi = sorted((r.lasp_bp, r.paas_bp))
        assert lo - 1 <= r.fisher_bp <= hi, r
        # floor(sqrt(L·P)) is within 1 of the true geometric mean
        assert r.fisher_bp * r.fisher_bp <= r.lasp_bp * r.paas_bp
        assert (r.fisher_bp + 1) ** 2 > r.lasp_bp * r.paas_bp


def test_fisher_components_match_standalone_indices(spark):
    """The fused lattice must reproduce the standalone Laspeyres and
    Paasche series bit-for-bit."""
    fused = {
        r.m: (r.lasp_bp, r.paas_bp)
        for r in RP.price_index_fisher(spark, SF_DIR).collect()
    }
    lasp = {
        r.m: r.index_bp
        for r in RP.price_index_series(spark, SF_DIR).collect()
    }
    paas = {
        r.m: r.index_bp
        for r in RP.price_index_paasche(spark, SF_DIR).collect()
    }
    assert {m: v[0] for m, v in fused.items()} == lasp
    assert {m: v[1] for m, v in fused.items()} == paas


def test_ship_delay_bands_conserve_lines_and_shares(spark):
    rows = RP.ship_delay_by_priority(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    caps = {"a_week": 7, "b_month": 30, "c_quarter": 90}
    by_prio: dict = {}
    for r in rows:
        # the synthetic fixture ships some lines BEFORE the order
        # date, so the bottom band legitimately holds negative
        # delays — pin the band CEILINGS, not positivity
        assert r.mean_delay_d <= caps.get(r.band, 10**9), r
        if r.band in ("b_month", "c_quarter", "d_longer"):
            floor = {"b_month": 7, "c_quarter": 30, "d_longer": 90}
            assert r.mean_delay_d > floor[r.band], r
        by_prio.setdefault(r.o_orderpriority, []).append(r.band_share_bp)
    for prio, shares in by_prio.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, prio


def test_order_value_bands_conserve_orders_and_revenue(spark):
    rows = RP.order_value_band_monthly(spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    )
    assert sum(r.revenue_cents for r in rows) == duckdb_scalar(
        "SELECT SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/orders.parquet'"
    )


def test_session_transition_probs_is_a_smoothed_distribution(spark):
    """Every entry row's probabilities sum to ≤10⁴ (truncation) and
    > 10⁴ − |cells|; the grid is the FULL entry×exit cross; the
    unsmoothed session mass matches the entry/exit matrix."""
    rows = R.session_transition_probs(spark, SF_DIR).collect()
    entries = {r.entry_type for r in rows}
    exits = {r.exit_type for r in rows}
    assert len(rows) == len(entries) * len(exits)
    by_entry: dict = {}
    for r in rows:
        assert r.prob_x10k >= 1  # Laplace: nothing is impossible
        by_entry.setdefault(r.entry_type, []).append(r.prob_x10k)
    for e, probs in by_entry.items():
        assert 10000 - len(probs) < sum(probs) <= 10000, e
    matrix = R.session_entry_exit_matrix(spark, SF_DIR).collect()
    assert sum(r.n_sessions for r in rows) == sum(
        m.n_sessions for m in matrix
    )


def test_weekend_uplift_identity(spark):
    """uplift_bp is the exact integer cross-ratio of the two
    event-per-day rates (computed pre-truncation)."""
    rows = R.events_weekend_uplift(spark, SF_DIR).collect()
    assert rows, "no event types survived"
    for r in rows:
        assert r.we_events > 0 and r.wd_events > 0
        # reconstruct: uplift = (we/we_days) / (wd/wd_days) in bp —
        # bound it with the truncated rates (±1 day granularity)
        assert r.uplift_bp > 0


def test_user_lifespan_bands_conserve_users_and_events(spark):
    rows = R.user_lifespan_bands(spark, SF_DIR).collect()
    assert sum(r.n_users for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    assert sum(r.total_events for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    )
    assert 10000 - len(rows) < sum(r.user_share_bp for r in rows) <= 10000


def test_packing_curve_is_monotone_and_matches_point_op(spark):
    """Padded waste grows with block size; the 512 point equals the
    corpus-wide aggregate of packing_efficiency's per-source rows."""
    rows = {
        r.block_size: r
        for r in T.packing_efficiency_curve(spark, SF_DIR).collect()
    }
    assert sorted(rows) == [128, 256, 512, 1024, 2048]
    waste = [rows[b].padded_waste for b in sorted(rows)]
    assert waste == sorted(waste)
    for r in rows.values():
        assert 0 <= r.packed_waste < r.block_size
    per_source = T.packing_efficiency(spark, SF_DIR).collect()
    assert rows[512].padded_waste == sum(
        r.padded_waste for r in per_source
    )
    assert rows[512].total_tokens == sum(
        r.total_tokens for r in per_source
    )


def test_embedding_sign_balance_conserves_vectors(spark):
    rows = S.embedding_sign_balance(spark, SF_DIR).collect()
    assert sum(r.n_vectors for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'"
    )
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.label_share_bp)
    for lab, shares in by_label.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, lab


def test_nation_balance_contrast_gap_identity(spark):
    for r in RP.nation_balance_contrast(spark, SF_DIR).collect():
        assert r.gap_cents == r.mean_cust_cents - r.mean_supp_cents
        assert r.n_customers > 0 and r.n_suppliers > 0


# ---- batch 2 ----


def test_supplier_revenue_deciles_partition_the_book(spark):
    rows = RP.supplier_revenue_deciles(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_suppliers for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT l_suppkey) FROM '{SF_DIR}/lineitem.parquet'"
    )
    # descending ranking: decile 1 holds the largest revenues
    for a, b in zip(rows, rows[1:]):
        assert a.min_cents >= b.max_cents
    assert 10000 - 10 < sum(r.revenue_share_bp for r in rows) <= 10000


def test_priority_loyalty_bounds(spark):
    rows = RP.priority_loyalty(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.loyal_customers <= r.n_customers
        assert 0 <= r.loyal_share_bp <= 10000
        # every loyal customer placed >= 2 orders (multi-order gate)
        assert r.loyal_orders >= 2 * r.loyal_customers


def test_order_width_monthly_conserves_lines(spark):
    rows = RP.order_width_monthly(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    # basket width is undefined for a line-less order, so the inner
    # join counts only orders that shipped something (the fixture
    # holds a few header-only orders)
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        assert r.lines_per_order_x100 >= 100  # every counted order has a line


def test_first_order_value_matrix_conserves_customers(spark):
    rows = RP.first_order_value_matrix(spark, SF_DIR).collect()
    assert sum(r.n_customers for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    )
    for r in rows:
        # lifetime >= first order, so LTV band >= first band
        assert r.ltv_band >= r.first_band


def test_brand_rank_stability_ranks_are_coherent(spark):
    rows = RP.brand_rank_stability(spark, SF_DIR).collect()
    n_top5 = sum(r.months_top5 for r in rows)
    n_months = duckdb_scalar(
        "SELECT COUNT(DISTINCT year(CAST(l_shipdate AS DATE)) * 12 "
        "+ month(CAST(l_shipdate AS DATE)) - 1) "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    # exactly 5 top-5 slots per month (rank() can tie but the
    # revenue-then-brand order is total, so ties are impossible)
    assert n_top5 == 5 * n_months
    for r in rows:
        assert 1 <= r.best_rank <= r.worst_rank
        assert r.best_rank * 100 <= r.mean_rank_x100 <= r.worst_rank * 100


def test_brand_quarter_growth_identity(spark):
    rows = RP.brand_quarter_growth(spark, SF_DIR).collect()
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand, series in by_brand.items():
        series.sort(key=lambda r: r.q)
        assert series[0].qoq_growth_bp is None  # no baseline
        for prev, cur in zip(series, series[1:]):
            assert cur.prev_cents == prev.rev_cents
            expected = ((cur.rev_cents - prev.rev_cents) * 10000) // prev.rev_cents
            if ((cur.rev_cents - prev.rev_cents) * 10000) % prev.rev_cents != 0 \
                    and (cur.rev_cents - prev.rev_cents) < 0:
                # python // floors; engines truncate toward zero
                expected += 1
            assert cur.qoq_growth_bp == expected, (brand, cur.q)


def test_events_daily_volatility_bounds(spark):
    rows = R.events_daily_volatility(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.mean_swing_bp <= r.max_swing_bp


def test_token_case_profile_is_a_partition_of_alpha_tokens(spark):
    rows = T.token_case_profile(spark, SF_DIR).collect()
    by_lang: dict = {}
    for r in rows:
        assert r.cls in ("a_lower", "b_capitalized", "c_allcaps", "d_mixed")
        by_lang.setdefault(r.lang, []).append(r.lang_share_bp)
    for lang, shares in by_lang.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, lang


# ---- batch 3 ----


def test_dedup_threshold_sensitivity_is_monotone_and_anchored(spark):
    """Higher threshold → fewer (or equal) pairs and flagged docs;
    the 80 % row must equal dedup_near's own survivor counts (same
    lattice, same verify)."""
    from ensembl_lakehouse_spark.operators import dedup as D

    rows = {
        r.threshold_pct: r
        for r in D.dedup_threshold_sensitivity(spark, SF_DIR).collect()
    }
    assert sorted(rows) == [50, 70, 80, 90]
    for lo, hi in [(50, 70), (70, 80), (80, 90)]:
        assert rows[lo].n_pairs >= rows[hi].n_pairs
        assert rows[lo].n_flagged_docs >= rows[hi].n_flagged_docs
    near = D.dedup_near(spark, SF_DIR).collect()
    assert rows[80].n_pairs == len(near)
    assert rows[80].n_flagged_docs == len({r.doc_b for r in near})


def test_net_multiplier_bands_conserve_lines_and_gross(spark):
    rows = RP.net_multiplier_bands(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert sum(r.gross_cents for r in rows) == duckdb_scalar(
        "SELECT SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        # discounts cap at ~10% and taxes at ~8% in the fixture, so
        # net stays within a sane corridor of gross per band
        assert 0 < r.net_cents


def test_docid_continuity_identities(spark):
    rows = RP.docid_continuity_audit(spark, SF_DIR).collect()
    n_docs = duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    )
    assert sum(r.n_docs for r in rows) == n_docs
    holes = {r.corpus_holes for r in rows}
    assert len(holes) == 1  # global headline repeats per row
    for r in rows:
        assert r.span_missing >= 0
        assert r.max_id - r.min_id + 1 == r.n_docs + r.span_missing


def test_embedding_exact_dups_conserves_and_bounds(spark):
    rows = S.embedding_exact_dups(spark, SF_DIR).collect()
    assert sum(r.n_vectors for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet'"
    )
    for r in rows:
        assert 0 <= r.n_families <= r.n_redundant or (
            r.n_families == 0 and r.n_redundant == 0
        )
        assert 0 <= r.redundant_share_bp <= 10000


def test_props_size_profile_conserves_events(spark):
    rows = R.props_size_profile(spark, SF_DIR).collect()
    assert sum(r.n_events for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    )
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.type_share_bp)
    for t, shares in by_type.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, t


# --- batch 4 ---------------------------------------------------------------


def test_linenumber_profile_conserves_lines_and_shares(spark):
    rows = RP.linenumber_price_profile(spark, SF_DIR).collect()
    assert [r.l_linenumber for r in rows] == sorted(
        r.l_linenumber for r in rows
    )
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    shares = [r.line_share_bp for r in rows]
    assert 10000 - len(shares) < sum(shares) <= 10000
    for r in rows:
        assert 0 <= r.avg_discount_bp <= 1000  # TPC-H discount ≤ 10 %


def test_negative_lead_audit_matches_direct_count(spark):
    rows = RP.negative_lead_audit(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert sum(r.early_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet' l "
        f"JOIN '{SF_DIR}/orders.parquet' o ON l_orderkey = o_orderkey "
        "WHERE l_shipdate < o_orderdate"
    )
    for r in rows:
        assert 0 <= r.early_lines <= r.n_lines
        assert (r.early_lines == 0) == (r.avg_early_days == 0)


def test_unit_price_bands_conserve_revenue(spark):
    rows = RP.unit_price_band_mix(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert sum(r.revenue_cents for r in rows) == duckdb_scalar(
        "SELECT SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    by_band: dict = {}
    for r in rows:
        by_band.setdefault(r.band, []).append(r.band_flag_share_bp)
    for band, shares in by_band.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, band


def test_session_depth_is_a_funnel(spark):
    rows = {r.depth: r for r in RP_sessions_depth(spark)}
    n_sessions = R.events_sessionize(spark, SF_DIR).count()
    assert rows[1].n_events == n_sessions  # every session has a 1st event
    for d in range(2, 10):
        if d in rows and (d - 1) in rows:
            assert rows[d].n_events <= rows[d - 1].n_events
    total = sum(r.n_events for r in rows.values())
    assert total == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    )


def RP_sessions_depth(spark):
    return R.session_depth_value_decay(spark, SF_DIR).collect()


def test_weekday_regularity_partitions_users(spark):
    rows = R.user_weekday_regularity(spark, SF_DIR).collect()
    assert sum(r.n_users for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows:
        assert 1 <= r.active_dows <= 7
        assert r.events_per_user >= 1


def test_prefix_collisions_are_internally_consistent(spark):
    rows = T.prefix_collision_rate(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    )
    for r in rows:
        assert r.n_prefixes <= r.n_docs
        assert r.colliding_docs != 1  # a collision needs ≥ 2 members
        assert r.largest_family <= r.n_docs
        assert (r.colliding_docs > 0) == (r.largest_family > 1)


def test_intra_doc_novelty_bounds_and_population(spark):
    rows = T.intra_doc_novelty(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        "WHERE len(string_split_regex(trim(text), '\\s+')) >= 2 "
        "AND length(trim(text)) > 0"
    )
    for r in rows:
        assert 0 <= r.min_novelty_bp <= r.avg_novelty_bp <= 10000
        assert 0 <= r.fully_novel_docs <= r.n_docs


def test_band_energy_is_a_share_of_total(spark):
    rows = S.embedding_band_energy(spark, SF_DIR).collect()
    assert sum(r.n_vecs for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/embeddings.parquet' e "
        "WHERE list_sum(list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
        "* CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))) > 0"
    )
    for r in rows:
        assert 0 <= r.lead_energy <= r.total_energy
        assert 0 <= r.pooled_lead_share_bp <= 10000
        assert 0 <= r.avg_lead_share_bp <= 10000


# --- batch 5 ---------------------------------------------------------------


def test_reconciliation_covers_every_lined_order(spark):
    rows = RP.order_total_reconciliation(spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        assert 0 <= r.mean_abs_diff_cents <= r.max_abs_diff_cents
        assert 0 <= r.tieout_1pct_bp <= 10000


def test_token_position_bias_is_topk_by_frequency(spark):
    rows = T.token_position_bias(spark, SF_DIR).collect()
    assert 0 < len(rows) <= T.POSITION_BIAS_TOPK
    occ = [r.occurrences for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        assert 0 <= r.mean_position_bp <= 10000


def test_apportionment_sums_exactly_to_budget(spark):
    """The Hamilton-method postcondition no independent rounding
    gives: Σ allocation == B exactly, with every source within 1 of
    its real-valued quota."""
    rows = T.token_budget_apportionment(spark, SF_DIR).collect()
    assert sum(r.allocation for r in rows) == T.APPORTION_BUDGET
    total = sum(r.token_mass for r in rows)
    for r in rows:
        lo = (r.token_mass * T.APPORTION_BUDGET) // total
        assert r.allocation in (lo, lo + 1), r


def test_prefix_screen_contains_exact_dups(spark):
    """Identical full texts share their 64-char prefix, so the
    prefix screen's hits are a SUPERSET of exact dups per source —
    and both cells therefore equal the exact-dup count."""
    rows = T.prefix_screen_precision(spark, SF_DIR).collect()
    for r in rows:
        assert r.exact_dups <= r.prefix_flagged <= r.n_docs
        assert r.both == r.exact_dups, r
        assert 0 <= r.precision_bp <= 10000


def test_embedding_coverage_counts_the_id_intersection(spark):
    rows = S.embedding_coverage_audit(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    )
    assert sum(r.with_embedding for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' d "
        f"WHERE d.doc_id IN (SELECT vec_id FROM "
        f"'{SF_DIR}/embeddings.parquet')"
    )
    for r in rows:
        assert 0 <= r.with_embedding <= r.n_docs
