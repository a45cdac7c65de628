"""Corpus language-model operators over ``documents`` (EXT X3):
bigram LM estimation, per-document LM fluency scoring, and feature
hashing — the CCNet-style statistical-quality layer of a training-
data pipeline (the reference delegates all computation to Athena and
has none of this, app/main.py:477-479).

- ``lm_bigram_topk`` estimates the corpus bigram model (add-one
  smoothed conditional probabilities) and reports the top successors
  per head word — the model table a perplexity filter scores
  against.
- ``lm_doc_score`` scores every document under that corpus model:
  mean conditional transition probability (fixed-point, so the
  per-doc sum is partition-order invariant) plus the rarest
  transition. Low mean ⇒ disfluent/garbage text; the bigram upgrade
  of text_token_rarity's unigram signal.
- ``hash_features`` buckets each document's token mass into FEAT_DIM
  hashed feature columns — the classic hashing-trick featurizer that
  feeds linear quality classifiers (fastText-style) without a
  vocabulary broadcast.

Determinism: probabilities are single IEEE divisions of exact
integers with the expression tree shared verbatim between engines
(every fractional literal CAST to DOUBLE); per-doc accumulation
rounds to fixed-point BIGINT before summing (bm25_search trick);
feature buckets hash with the cross-engine md5 contract
(functions/hashing.py).

At 100 TB: everything is the wordcount lattice — map-side explode,
partial-agg on high-cardinality unskewed keys ((w1, w2), (doc,
bucket)), then joins whose small sides are either genuinely small
(the V scalar) or deliberately un-hinted (the pair-count model is
vocabulary²-bounded: broadcastable for a curated LM, sort-merged for
a web-scale one — AQE decides, the text_doc_terms precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.hashing import spark_md5_long31, sql_md5_long31

from ensembl_lakehouse_spark.operators.text import _SQL_PREP, _docs_with_tokens

#: Successors reported per head word.
LM_TOPK = 3

#: Fixed-point scale for per-transition probabilities (nano-units).
LM_FP = 1_000_000_000

#: Feature-hash dimensionality.
FEAT_DIM = 16

#: Shared conditional-probability expression (add-one smoothing,
#: identical double tree in both engines).
_COND_P = "CAST({pair} + 1 AS DOUBLE) / ({head} + {v})"

#: Fixed-point rounding of the above.
_COND_FP = (
    "CAST(floor(" + _COND_P + " * CAST({fp} AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)

#: Spark bigram pair structs (element_at is 1-based, matching DuckDB
#: list indexing). Empty-guard via slice: Spark's sequence(1, 0) is
#: the DESCENDING [1, 0] (the functions/hashing.py:69 pitfall), so a
#: bare greatest(size-1, 0) upper bound would evaluate
#: element_at(toks, 0) and throw on 0/1-token docs; slicing the
#: 1..size sequence down to size-1 entries yields [] instead, and
#: every surviving index i has i+1 <= size. Matches the DuckDB twin
#: (range(1, n) is empty for n <= 1).
_PAIRS_EXPR = (
    "transform(slice(sequence(1, greatest(size(toks), 1)), 1, "
    "greatest(size(toks) - 1, 0)), "
    "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
)

_SQL_PAIRS = (
    "list_transform(range(1, greatest(len(toks) - 1, 0) + 1), "
    "i -> {'w1': toks[i], 'w2': toks[i + 1]})"
)


def _pair_counts(spark: SparkSession, sf_dir: str):
    """(pairs, heads, vocab-size) lattice shared by both LM queries."""
    # spread=False: the pair lattice is referenced by heads AND
    # pairs (and lm_doc_score re-joins it) — each reference re-pays
    # a spread exchange (measured lm_doc_score 0.93 s -> 1.46 s)
    toks = _docs_with_tokens(spark, sf_dir, spread=False).where(F.size("toks") >= 2)
    inst = toks.select(
        "doc_id", F.explode(F.expr(_PAIRS_EXPR)).alias("p")
    ).select("doc_id", "p.w1", "p.w2")
    # localCheckpoint (r11, guide §3.3): the vocabulary²-bounded pair
    # model feeds heads AND the consumer join (lm_bigram_topk reads it
    # twice, lm_doc_score three ways) — uncheckpointed, every
    # reference re-ran the tokenize + bigram-explode + count subtree.
    # The model materializes once; inst stays lazy (scored in one
    # fresh pass by lm_doc_score).
    pairs = inst.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_pair")
    ).localCheckpoint()
    heads = pairs.groupBy("w1").agg(F.sum("n_pair").alias("n_head"))
    vocab = (
        _docs_with_tokens(spark, sf_dir, spread=False)
        .select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term").alias("v"))
    )
    return inst, pairs, heads, vocab


_SQL_LM_PREP = f"""
{_SQL_PREP}, d AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 2
), inst AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2
  FROM (SELECT doc_id, unnest({_SQL_PAIRS}) AS p FROM d)
), pairs AS (
  SELECT w1, w2, COUNT(*) AS n_pair FROM inst GROUP BY w1, w2
), heads AS (
  SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_head FROM pairs GROUP BY w1
), vocab AS (
  SELECT COUNT(DISTINCT term) AS v
  FROM (SELECT unnest(toks) AS term FROM t)
)"""


def lm_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM: per head word, the LM_TOPK most frequent
    successors with add-one-smoothed conditional probability
    ``(c(w1,w2) + 1) / (c(w1·) + V)``.

    Plan: pair counts (wordcount shape) → per-head totals (aggregate
    of the aggregate) → 1-row vocab broadcast → per-head
    WindowGroupLimit top-k. The model table this emits is what
    lm_doc_score joins against.
    """
    _, pairs, heads, vocab = _pair_counts(spark, sf_dir)
    return (
        pairs.join(heads, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "cond_p",
            F.expr(_COND_P.format(pair="n_pair", head="n_head", v="v")),
        )
        .withColumn(
            "rank",
            F.expr(
                "row_number() OVER (PARTITION BY w1 "
                "ORDER BY n_pair DESC, w2 ASC)"
            ),
        )
        .where(F.col("rank") <= LM_TOPK)
        .select("w1", "rank", "w2", "n_pair", "n_head", "cond_p")
        .orderBy("w1", "rank")
    )


LM_BIGRAM_TOPK_SQL = f"""
{_SQL_LM_PREP}
SELECT w1, rank, w2, n_pair, n_head, cond_p FROM (
  SELECT pairs.w1, pairs.w2, pairs.n_pair, heads.n_head,
         {_COND_P.format(pair="pairs.n_pair", head="heads.n_head", v="vocab.v")} AS cond_p,
         row_number() OVER (PARTITION BY pairs.w1
           ORDER BY pairs.n_pair DESC, pairs.w2 ASC) AS rank
  FROM pairs JOIN heads ON pairs.w1 = heads.w1 CROSS JOIN vocab)
WHERE rank <= {LM_TOPK}
ORDER BY w1, rank
"""


def lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency under the corpus bigram LM: mean
    smoothed transition probability (fixed-point) and the rarest
    transition — the bigram form of the CCNet perplexity filter.
    The corpus model includes the document itself (leave-one-in),
    identically in both engines.

    Plan: bigram instances join the pair-count model on (w1, w2) and
    the head totals on w1 — both joins un-hinted (vocabulary-bounded
    model side; AQE broadcasts at fixture SFs) — then one per-doc
    partial agg of fixed-point BIGINTs.
    """
    inst, pairs, heads, vocab = _pair_counts(spark, sf_dir)
    fp = _COND_FP.format(pair="n_pair", head="n_head", v="v", fp=LM_FP)
    return (
        inst.join(pairs, ["w1", "w2"])
        .join(heads, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", F.expr(fp).alias("p_fp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_fp").alias("sum_p_fp"),
            F.min("p_fp").alias("min_p_fp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr(
                f"CAST(sum_p_fp AS DOUBLE) / n_bigrams"
                f" / CAST({LM_FP} AS DOUBLE)"
            ).alias("mean_cond_p"),
            "min_p_fp",
        )
        .orderBy("doc_id")
    )


LM_DOC_SCORE_SQL = f"""
{_SQL_LM_PREP}
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(p_fp) AS DOUBLE) / COUNT(*) / CAST({LM_FP} AS DOUBLE)
         AS mean_cond_p,
       MIN(p_fp) AS min_p_fp
FROM (
  SELECT inst.doc_id,
         {_COND_FP.format(pair="pairs.n_pair", head="heads.n_head", v="vocab.v", fp=LM_FP)} AS p_fp
  FROM inst
  JOIN pairs ON inst.w1 = pairs.w1 AND inst.w2 = pairs.w2
  JOIN heads ON inst.w1 = heads.w1
  CROSS JOIN vocab)
GROUP BY doc_id
ORDER BY doc_id
"""


#: Cross-engine term→bucket hash (md5 contract, functions/hashing.py).
_BUCKET_SPARK = f"{spark_md5_long31('term')} % {FEAT_DIM}"
_BUCKET_DUCK = f"{sql_md5_long31('term')} % {FEAT_DIM}"


def hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEAT_DIM-dimensional hashed bag-of-words per document: token
    occurrences bucketed by the cross-engine md5 hash, emitted as
    wide BIGINT columns f0..f{FEAT_DIM-1} — the hashing-trick
    featurizer (no vocabulary table, no broadcast, collision-folding
    by design).

    Plan: explode → bucket map-side → ONE per-doc partial agg of
    FEAT_DIM conditional sums. Strictly map + one agg; the dense
    row-vector layout (not a sparse map) is what a downstream linear
    scorer consumes directly. The registry entry sorts for display;
    pipeline consumers (classifier training/scoring) use the
    unsorted core and skip that range exchange.
    """
    return hash_features_core(spark, sf_dir).orderBy("doc_id")


def hash_features_core(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """hash_features without the final ORDER BY — the form a
    downstream join/agg consumes (its exchange would destroy the
    order anyway). ``spread=False`` for consumers that join this
    lattice against a second spread lattice (each side would pay
    its own exchange — the _docs_with_tokens rule)."""
    toks = _docs_with_tokens(spark, sf_dir, spread=spread)
    bucketed = toks.select(
        "doc_id", F.explode("toks").alias("term")
    ).withColumn("bucket", F.expr(_BUCKET_SPARK))
    aggs = [
        F.sum(F.when(F.col("bucket") == b, 1).otherwise(0))
        .cast("long")
        .alias(f"f{b}")
        for b in range(FEAT_DIM)
    ]
    return bucketed.groupBy("doc_id").agg(*aggs)


_FEATURE_SUMS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN bucket = {b} THEN 1 ELSE 0 END) AS BIGINT) AS f{b}"
    for b in range(FEAT_DIM)
)

HASH_FEATURES_SQL = f"""
{_SQL_PREP}, b AS (
  SELECT doc_id, {_BUCKET_DUCK} AS bucket
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
)
SELECT doc_id,
       {_FEATURE_SUMS}
FROM b
GROUP BY doc_id
ORDER BY doc_id
"""
