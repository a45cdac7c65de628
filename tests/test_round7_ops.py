"""Semantic pins for the round-7 operator batches — value-level
properties the oracle hash can't express (conservation, bounds,
monotonicity, cross-run determinism)."""

from __future__ import annotations

import duckdb

from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR


def _scalar(sql: str):
    return duckdb.sql(sql).fetchone()[0]


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
    assert n_docs == _scalar(
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
    day_lo = _scalar(
        f"SELECT CAST(floor(epoch(MIN(ts))/86400) AS BIGINT) "
        f"FROM '{SF_DIR}/events.parquet'"
    )
    day_hi = _scalar(
        f"SELECT CAST(floor(epoch(MAX(ts))/86400) AS BIGINT) "
        f"FROM '{SF_DIR}/events.parquet'"
    )
    for r in rows.values():
        assert day_lo <= r.shift_day <= day_hi
        assert 0 <= r.shift_e6 <= 1_000_000
        assert abs(r.cusum) <= r.n * r.total  # |S_t| bound


def test_events_gap_histogram_conserves_gaps(spark):
    rows = {r.band: r for r in R.events_gap_histogram(spark, SF_DIR).collect()}
    n_events = _scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    n_users = _scalar(
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
    n_events = _scalar(f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'")
    n_users = _scalar(
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
