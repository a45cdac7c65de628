"""Unit tests: operators/search (BM25 ranked retrieval + inverted
index). The oracle differential is the deep gate; these pin the
retrieval invariants fast at sf0.001."""

from __future__ import annotations

from ensembl_lakehouse_spark.operators import search as SR
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR


def test_bm25_topk_ranked_and_bounded(spark):
    rows = SR.bm25_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= SR.BM25_TOPK
    scores = [r.score_fp for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r.n_terms_matched <= len(SR.QUERY_TERMS)
        assert r.score_fp > 0
        assert abs(r.score - r.score_fp / SR.BM25_FP) < 1e-12


def test_bm25_hits_actually_contain_a_query_term(spark):
    hits = {r.doc_id for r in SR.bm25_search(spark, SF_DIR).collect()}
    docs = {
        r.doc_id
        for r in T._docs_with_tokens(spark, SF_DIR)
        .select("doc_id", "toks")
        .collect()
        if set(r.toks) & set(SR.QUERY_TERMS)
    }
    assert hits <= docs


def test_inverted_postings_sorted_capped_consistent(spark):
    rows = SR.inverted_postings(spark, SF_DIR).collect()
    assert rows
    terms = [r.term for r in rows]
    assert terms == sorted(terms)
    for r in rows:
        assert list(r.postings) == sorted(r.postings)
        assert len(r.postings) == min(r.df, SR.POSTINGS_CAP)
        assert r.cf >= r.df >= 1


def test_rank_fusion_blends_both_lists(spark):
    """RRF sanity: every fused row's score equals the recomputed
    1/(k+r) sum; docs appearing in BOTH lists outrank equal-rank
    single-list docs; output bounded by RRF_TOPK."""
    rows = SR.rank_fusion(spark, SF_DIR).collect()
    assert 0 < len(rows) <= SR.RRF_TOPK
    for r in rows:
        want = 0.0
        if r.r_lex is not None:
            want += 1.0 / (SR.RRF_K + r.r_lex)
        if r.r_sem is not None:
            want += 1.0 / (SR.RRF_K + r.r_sem)
        assert abs(r.rrf - want) < 1e-15
        assert r.r_lex is not None or r.r_sem is not None
    # ordered by fused score descending
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
