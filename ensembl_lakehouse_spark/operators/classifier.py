"""In-engine trained quality classifier (EXT): closed-form ridge
regression over hashed bag-of-words features, trained AND scored in
one Spark job — the fastText-style linear gate (CCNet §4.4 uses
exactly this: a linear model over hashed n-grams) that training-data
pipelines run after the statistical filters.

The reference computes nothing itself (Athena delegation,
app/main.py:477-479); this operator shows the engine closing the
loop: featurize → reduce to normal equations → solve → broadcast →
score, with NO separate ML system.

Scale shape (the embedding_pca reduction, on integer features):

- **Executors reduce to d×d.** Each Arrow batch contributes exact
  int64 partials of X'X and X'y over the (FEAT_DIM+1)-dim feature
  vectors (intercept prepended). Token counts are small integers, so
  the partial products are EXACT — no quantization step needed
  (unlike PCA's float embeddings); summed in DECIMAL(38,0), the
  reduction is partition-order invariant: same run, same bits, any
  partitioning. Shuffle volume after partial agg: ≤ d² + d rows
  total, independent of corpus size.
- **The driver solves d×d ridge** (λ ridge keeps hash-collision
  collinearity harmless), O(d³) microseconds at d=17.
- **Scoring is map-only**: weights travel as a literal array in the
  plan; ŷ is an in-expression dot product — whole-stage codegen, no
  Python in the scoring path, linear to 100 TB.

Label: is-English (lang == 'en') — self-contained ground truth on
the fixture; a production run swaps in any labeled subset (the label
expression is one line). No DuckDB oracle: the matrix solve is not
SQL-expressible (embedding_pca precedent — driver records the
rows-only check); the numeric pin is tests/test_classifier.py
against numpy.linalg solving the same normal equations on collected
data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ensembl_lakehouse_spark.operators.lm import FEAT_DIM, hash_features_core
from ensembl_lakehouse_spark.operators.text import _docs_with_tokens

#: Ridge regularization strength.
RIDGE_LAMBDA = 1.0

#: Feature dimension including intercept.
_D = FEAT_DIM + 1

_PARTIAL_SCHEMA = StructType(
    [
        StructField("i", LongType(), False),
        StructField("j", LongType(), False),
        StructField("psum", LongType(), False),
    ]
)

_FEAT_COLS = [f"f{b}" for b in range(FEAT_DIM)]


def _partial_normal_eq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Exact int64 partials of the normal equations per Arrow batch:
    upper-triangle X'X entries as (i, j, Σ x_i·x_j) and X'y as
    (i, -1, Σ x_i·y). Counts are O(doc length), so products fit int64
    with astronomical headroom; chunking is unnecessary."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        x = np.concatenate(
            [np.ones((len(pdf), 1), dtype=np.int64),
             pdf[_FEAT_COLS].to_numpy(dtype=np.int64)],
            axis=1,
        )
        y = pdf["label"].to_numpy(dtype=np.int64)
        gram = x.T @ x
        xty = x.T @ y
        iu = np.triu_indices(_D)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu[0], np.arange(_D)]),
                "j": np.concatenate([iu[1], np.full(_D, -1)]),
                "psum": np.concatenate([gram[iu], xty]),
            }
        )


def _featurized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash_features (unsorted core — the join destroys order) +
    binary is-English label."""
    # spread reverted on both sides (r11 A/B): +0.40 s at sf0.1 —
    # the doc_id join reshuffles both lattices anyway (partition
    # counts differ), so each spread exchange was pure overhead
    labels = _docs_with_tokens(spark, sf_dir, spread=False).select(
        "doc_id", (F.col("lang") == "en").cast("long").alias("label")
    )
    return hash_features_core(spark, sf_dir, spread=False).join(labels, "doc_id")


def train_ridge(
    spark: SparkSession, sf_dir: str, feats: DataFrame | None = None
) -> list[float]:
    """Distributed normal equations + driver-side ridge solve;
    returns the (FEAT_DIM+1)-vector of weights, intercept first.
    Pass a prebuilt (ideally checkpointed) ``feats`` frame to share
    the featurization with a scoring pass."""
    import numpy as np

    feats = _featurized(spark, sf_dir) if feats is None else feats
    partials = feats.mapInPandas(_partial_normal_eq, schema=_PARTIAL_SCHEMA)
    moments = (
        partials.groupBy("i", "j")
        .agg(F.sum(F.col("psum").cast("decimal(38,0)")).alias("total"))
        .collect()  # bounded: d²/2 + d rows by construction
    )
    gram = np.zeros((_D, _D))
    xty = np.zeros(_D)
    for r in moments:
        if r.j == -1:
            xty[r.i] = float(r.total)
        else:
            gram[r.i, r.j] = float(r.total)
            gram[r.j, r.i] = float(r.total)
    reg = RIDGE_LAMBDA * np.eye(_D)
    reg[0, 0] = 0.0  # never regularize the intercept
    w = np.linalg.solve(gram + reg, xty)
    return [float(v) for v in w]


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the ridge is-English model on the corpus, then score
    every document map-side: (doc_id, label, score, predicted).

    Weights enter the scoring plan as literal doubles, so scoring is
    one codegen'd expression per row — the train step's only cluster
    cost is the d×d reduction above. The featurized frame is built
    ONCE and localCheckpointed so training and scoring share it
    instead of re-running the scan+tokenize+agg pipeline twice (the
    _near_pipeline multi-consumer reasoning)."""
    feats = _featurized(spark, sf_dir).localCheckpoint()
    w = train_ridge(spark, sf_dir, feats=feats)
    dot = " + ".join(
        [repr(w[0])] + [f"{w[b + 1]!r} * f{b}" for b in range(FEAT_DIM)]
    )
    return (
        feats.withColumn("score", F.expr(f"CAST({dot} AS DOUBLE)"))
        .select(
            "doc_id",
            "label",
            "score",
            (F.col("score") > 0.5).cast("long").alias("predicted"),
        )
        .orderBy("doc_id")
    )
