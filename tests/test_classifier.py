"""Ridge quality classifier: distributed normal equations pinned
against numpy on collected data, plus sanity on the learned gate."""

from __future__ import annotations

import numpy as np

from ensembl_lakehouse_spark.operators import classifier as CL
from tests.conftest import SF_DIR


def test_weights_match_numpy_exactly(spark):
    w_spark = np.array(CL.train_ridge(spark, SF_DIR))
    pdf = CL._featurized(spark, SF_DIR).toPandas()
    x = np.concatenate(
        [np.ones((len(pdf), 1)), pdf[CL._FEAT_COLS].to_numpy(dtype=float)],
        axis=1,
    )
    y = pdf["label"].to_numpy(dtype=float)
    reg = CL.RIDGE_LAMBDA * np.eye(CL._D)
    reg[0, 0] = 0.0
    w_ref = np.linalg.solve(x.T @ x + reg, x.T @ y)
    # the distributed Gram is EXACT integer, so the only deviation is
    # the float64 cast of identical integers: bitwise-equal inputs.
    assert np.allclose(w_spark, w_ref, rtol=0, atol=1e-12)


def test_classifier_beats_majority_baseline(spark):
    rows = CL.quality_classifier(spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    acc = sum(1 for r in rows if r.predicted == r.label) / n
    majority = max(
        sum(1 for r in rows if r.label == 1), sum(1 for r in rows if r.label == 0)
    ) / n
    # hashed unigram counts separate the fixture's language-marker
    # vocabularies at least as well as always-guessing-majority
    assert acc >= majority
    for r in rows:
        assert r.predicted in (0, 1)


def test_scoring_is_deterministic_across_runs(spark):
    a = [(r.doc_id, r.score) for r in CL.quality_classifier(spark, SF_DIR).collect()]
    b = [(r.doc_id, r.score) for r in CL.quality_classifier(spark, SF_DIR).collect()]
    assert a == b
