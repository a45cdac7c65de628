"""Semantic pins for the round-5 operators (the oracle gate proves
cross-engine equality; these prove the NUMBERS mean what the
docstrings claim)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators import analytics as A
from ensembl_lakehouse_spark.operators import dedup as D
from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.operators import similarity as S
from ensembl_lakehouse_spark.operators import text as T
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_events_topk_per_hour_matches_recomputed_counts(spark):
    rows = R.events_topk_per_hour(spark, SF_DIR).collect()
    assert rows
    truth = Counter()
    for r in load_table(spark, SF_DIR, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).collect():
        truth[(r.h, r.event_type)] += 1
    by_hour = defaultdict(list)
    for (h, et), n in truth.items():
        by_hour[h].append((-n, et))
    for r in rows:
        assert 1 <= r.rank <= R.TRENDING_K
        assert truth[(r.hour, r.event_type)] == r.n_events
        expected = sorted(by_hour[r.hour])[r.rank - 1]
        assert (-(r.n_events), r.event_type) == expected


def test_events_dow_profile_shares_and_weekday_arithmetic(spark):
    rows = R.events_dow_profile(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.dow <= 6 for r in rows)
    per_dow = defaultdict(int)
    for r in rows:
        per_dow[r.dow] += r.n_events
    for r in rows:
        assert r.share_bp == (r.n_events * R.DOW_SHARE_SCALE) // per_dow[r.dow]
    # spot-check the weekday formula on one known timestamp:
    # 1970-01-01 (epoch day 0) was a Thursday -> (0+3)%7 == 3
    assert (0 + 3) % 7 == 3


def test_basket_rules_confidence_and_lift_consistency(spark):
    rows = A.basket_rules(spark, SF_DIR).collect()
    assert rows
    pair_seen = {(r.antecedent, r.consequent) for r in rows}
    for r in rows:
        # both directions of every mined pair compete
        assert (r.consequent, r.antecedent) in pair_seen
        assert 0 < r.support <= min(r.supp_a, r.supp_b)
        assert 0 < r.conf_bp <= A.RULES_SCALE
        assert r.conf_bp == (r.support * A.RULES_SCALE) // r.supp_a
        assert r.lift_fp > 0


def test_cooccur_pmi_counts_are_consistent(spark):
    rows = T.cooccur_pmi(spark, SF_DIR).collect()
    assert 0 < len(rows) <= T.COOCCUR_TOP_N
    for r in rows:
        assert r.term_a < r.term_b
        assert r.pair_df >= T.COOCCUR_MIN_PAIR_DF
        assert r.pair_df <= min(r.df_a, r.df_b)
        assert r.pmi_fp >= 0


def test_doc_jaccard_knn_against_python_recompute(spark):
    rows = D.doc_jaccard_knn(spark, SF_DIR).collect()
    assert rows
    # recompute the capped projection in Python
    docs = load_table(spark, SF_DIR, "documents").collect()
    toks = {
        d.doc_id: set(d.text.strip().split())
        for d in docs
        if d.text and d.text.strip()
    }
    df = Counter(t for s in toks.values() for t in s)
    n_docs = len(toks)
    keep = {t for t, c in df.items() if c * D.JKNN_DF_DIV <= n_docs}
    proj = {d: s & keep for d, s in toks.items()}
    for r in rows:
        a, b = proj[r.doc_id], proj[r.neighbor_id]
        assert len(a & b) == r.inter > 0
        assert r.jac_bp == (r.inter * 10000) // len(a | b)
        assert 1 <= r.rank <= D.JKNN_K
        assert r.neighbor_id != r.doc_id


def test_embedding_margin_audit_agrees_with_topk(spark):
    margins = {r.q_id: r for r in S.embedding_margin_audit(spark, SF_DIR).collect()}
    topk = S.similarity_topk(spark, SF_DIR).collect()
    assert margins
    for t in topk:
        m = margins[t.q_id]
        if t.rank == 1:
            assert t.vec_id == m.top1_id and t.cosine == m.cos1
        if t.rank == 2:
            assert t.vec_id == m.top2_id and t.cosine == m.cos2
    for m in margins.values():
        assert m.cos1 >= m.cos2
        assert abs(m.margin - (m.cos1 - m.cos2)) == 0.0


def test_dedup_cluster_keep_list_matches_component_labels(spark):
    rows = D.dedup_cluster_keep_list(spark, SF_DIR).collect()
    assert rows
    comp = D.components_recursive(spark, SF_DIR).collect()
    members = defaultdict(set)
    for c in comp:
        members[c.component].add(c.doc_id)
    tokens = {
        d.doc_id: len(d.text.strip().split())
        for d in load_table(spark, SF_DIR, "documents").collect()
        if d.text and d.text.strip()
    }
    listed = {r.keep_doc_id for r in rows}
    assert listed == {c for c, m in members.items() if len(m) > 1}
    for r in rows:
        m = members[r.keep_doc_id]
        assert r.n_members == len(m)
        assert r.keep_doc_id == min(m)  # canonical rep = min label
        assert r.tokens_kept == tokens[r.keep_doc_id]
        assert r.tokens_dropped == sum(
            tokens[d] for d in m if d != r.keep_doc_id
        )


def test_ngram_novelty_against_python_recompute(spark):
    rows = {r.doc_id: r for r in T.ngram_novelty(spark, SF_DIR).collect()}
    assert rows
    docs = {
        d.doc_id: d.text.strip().split()
        for d in load_table(spark, SF_DIR, "documents").collect()
        if d.text and d.text.strip()
    }
    def shingles(toks):
        n = T.NOVELTY_N
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sh = {d: shingles(t) for d, t in docs.items()}
    df = Counter(g for s in sh.values() for g in s)
    assert set(rows) == set(sh)
    for d, r in rows.items():
        uniq = sum(1 for g in sh[d] if df[g] == 1)
        assert r.n_grams == len(sh[d])
        assert r.n_unique == uniq
        assert r.novelty_bp == (uniq * 10000) // len(sh[d])
