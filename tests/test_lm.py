"""Unit tests: operators/lm (bigram LM, doc fluency score, feature
hashing). The oracle differential is the deep gate; these pin the
probabilistic invariants and cross-check feature mass at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators import lm as LM
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR


def test_bigram_topk_probabilities_valid(spark):
    rows = LM.lm_bigram_topk(spark, SF_DIR).collect()
    assert rows
    by_head: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.rank <= LM.LM_TOPK
        assert 0.0 < r.cond_p < 1.0
        assert 1 <= r.n_pair <= r.n_head
        by_head.setdefault(r.w1, []).append(r)
    for head_rows in by_head.values():
        counts = [r.n_pair for r in sorted(head_rows, key=lambda r: r.rank)]
        assert counts == sorted(counts, reverse=True)


def test_doc_score_bounds_and_coverage(spark):
    rows = LM.lm_doc_score(spark, SF_DIR).collect()
    assert rows
    n_eligible = (
        T._docs_with_tokens(spark, SF_DIR).where(F.size("toks") >= 2).count()
    )
    assert len(rows) == n_eligible
    for r in rows:
        assert r.n_bigrams >= 1
        assert 0.0 < r.mean_cond_p <= 1.0
        assert 1 <= r.min_p_fp <= LM.LM_FP


def test_hash_features_mass_conserved(spark):
    rows = LM.hash_features(spark, SF_DIR).collect()
    assert rows
    feat_cols = [f"f{b}" for b in range(LM.FEAT_DIM)]
    totals = {
        r.doc_id: r.n_tokens
        for r in T.text_token_stats(spark, SF_DIR).collect()
    }
    for r in rows:
        assert sum(r[c] for c in feat_cols) == totals[r.doc_id]
