"""Bloom semi-join reduction: the no-false-negative law and the
effectiveness of the pruning."""

from __future__ import annotations

from ensembl_lakehouse_spark.operators import bloom as B
from tests.conftest import SF_DIR


def test_bloom_never_drops_a_true_match_and_prunes(spark):
    rows = B.join_bloom_pruned(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # every true match passes the filter (no false negatives):
        # the passing set is exactly true matches + false positives
        assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
        assert 0 <= r.n_false_pos
        assert r.n_bloom_pass <= r.n_orders
        # pruning does real work: the filter rejects most non-matches
        non_match = r.n_orders - r.n_true_match
        if non_match:
            assert r.n_false_pos / non_match < 0.25
        assert abs(r.fp_rate - r.n_false_pos / r.n_orders) < 1e-12
