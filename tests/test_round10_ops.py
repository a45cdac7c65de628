"""Semantic pins for the round-10 batch-3/4 operators — value-level
properties the oracle hash can't express (conservation, bounds,
provable identities)."""

from __future__ import annotations


from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import reports as RP
from ensembl_lakehouse_spark.operators import similarity as S
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR, duckdb_scalar


def test_session_entry_exit_conserves_sessions(spark):
    rows = R.session_entry_exit_matrix(spark, SF_DIR).collect()
    sessions = R.events_sessionize(spark, SF_DIR).count()
    assert sum(r.n_sessions for r in rows) == sessions
    # shares partition each entry row: truncation loses < |cells| bp
    by_entry: dict = {}
    for r in rows:
        assert 0 <= r.entry_share_bp <= 10000
        by_entry.setdefault(r.entry_type, []).append(r.entry_share_bp)
    for entry, shares in by_entry.items():
        assert 10000 - len(shares) < sum(shares) <= 10000, entry


def test_brand_return_exposure_conserves_lines_and_cents(spark):
    rows = RP.brand_return_exposure(spark, SF_DIR).collect()
    assert sum(r.n_lines for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    )
    assert sum(r.revenue_cents for r in rows) == duckdb_scalar(
        "SELECT SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    for r in rows:
        assert 0 <= r.returned_lines <= r.n_lines
        assert 0 <= r.returned_cents <= r.revenue_cents
        assert 0 <= r.return_rate_bp <= 10000
        assert 0 <= r.value_at_risk_bp <= 10000


def test_price_index_paasche_base_month_is_par(spark):
    rows = RP.price_index_paasche(spark, SF_DIR).collect()
    base = min(rows, key=lambda r: r.m)
    # base month: p == p0 for every basket part, so the index is
    # exactly par by construction
    assert base.index_bp == 10000
    assert base.cur_cents == base.base_cents
    for r in rows:
        assert r.basket_parts >= 1 and r.index_bp > 0


def test_price_index_laspeyres_base_month_is_par(spark):
    rows = RP.price_index_series(spark, SF_DIR).collect()
    base = min(rows, key=lambda r: r.m)
    assert base.index_bp == 10000
    assert base.cur_cents == base.base_cents


def test_embedding_dominant_dim_bounds_and_conservation(spark):
    rows = S.embedding_dominant_dim(spark, SF_DIR).collect()
    dim = duckdb_scalar(
        f"SELECT MAX(len(embedding)) FROM '{SF_DIR}/embeddings.parquet'"
    )
    nonzero = duckdb_scalar(
        "SELECT COUNT(*) FROM (SELECT list_max(list_transform(embedding, "
        "x -> abs(CAST(x AS DOUBLE)))) AS mx FROM "
        f"'{SF_DIR}/embeddings.parquet') WHERE mx > 0.0"
    )
    assert sum(r.n_vectors for r in rows) == nonzero
    for r in rows:
        assert 1 <= r.dom_dim <= dim
        assert 0 <= r.label_share_bp <= 10000


def test_packing_efficiency_padded_dominates_packed(spark):
    rows = T.packing_efficiency(spark, SF_DIR).collect()
    for r in rows:
        # theorem: sum of per-doc pads is congruent to the packed
        # final-block waste mod 512 and non-negative, so it can never
        # be smaller
        assert r.padded_waste >= r.packed_waste
        assert (r.padded_waste - r.packed_waste) % 512 == 0
        assert 0 <= r.packed_waste < 512
        assert 0 <= r.padded_waste_bp <= 10000
    # conservation: token totals match the shared tokenizer's count
    assert sum(r.total_tokens for r in rows) == duckdb_scalar(
        "SELECT SUM(len(string_split_regex(trim(text), '\\s+'))) FROM "
        f"'{SF_DIR}/documents.parquet' WHERE length(trim(text)) > 0"
    )


def test_first_purchase_latency_conserves_users(spark):
    rows = R.first_purchase_latency_bands(spark, SF_DIR).collect()
    assert sum(r.n_users for r in rows) == duckdb_scalar(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    )
    shares = [r.user_share_bp for r in rows]
    assert 10000 - len(shares) < sum(shares) <= 10000
    never = next((r for r in rows if r.band == "e_never"), None)
    if never is not None:
        assert never.n_users == duckdb_scalar(
            "SELECT COUNT(*) FROM (SELECT user_id FROM "
            f"'{SF_DIR}/events.parquet' GROUP BY 1 HAVING "
            "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0)"
        )


def test_source_length_skew_shares_partition_each_source(spark):
    rows = T.source_length_skew(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == duckdb_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    )
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert -10000 <= r.skew_bp <= 10000
        assert r.skew_bp == r.src_share_bp - r.corpus_share_bp
    for source, cells in by_source.items():
        shares = [c.src_share_bp for c in cells]
        assert 10000 - len(shares) < sum(shares) <= 10000, source
