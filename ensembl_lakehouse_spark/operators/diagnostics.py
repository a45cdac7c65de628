"""Pipeline diagnostics: the audit queries a production data-curation
deployment schedules alongside the operators themselves (EXT; the
reference has no analog — its execution is delegated wholesale,
app/main.py:479).

Approximate operators earn their keep only if their error is
*measured on the actual corpus*: hyperplane-LSH recall collapses on an
isotropic embedding distribution (similarity.py's tuning note), and
MinHash estimation error depends on document length and shingle
overlap structure. These two queries turn those claims into numbers —
run at target scale they are the evidence for (or against) the chosen
(L, P) / (K, bands) knobs.

Both are deterministic end-to-end (md5-derived constants, integer
counts, one double division at the end) and therefore fully
oracle-checkable — the audit itself is cross-engine verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.hashing import sql_md5_long31
from ensembl_lakehouse_spark.operators.dedup import (
    BANDS,
    BUCKET_CAP,
    K_MINHASH,
    _duck_band_keys,
    _duck_signature,
    _shingled,
    _spark_band_keys,
    _spark_signature,
    _WORD_S_CTE,
)
from ensembl_lakehouse_spark.operators.similarity import (
    SIMILARITY_IVF_SQL,
    SIMILARITY_LSH_SQL,
    SIMILARITY_TOPK_SQL,
    similarity_ivf,
    similarity_lsh,
    similarity_topk,
)
from ensembl_lakehouse_spark.sources.tables import load_spread, load_table


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both ANN paths (hyperplane LSH, IVF/nprobe) against
    the exact brute-force top-k, per query vector.

    The exact operator is the ground truth by construction; each ANN
    result is left-joined on (q_id, vec_id) and hits are counted —
    recall@k = |ANN ∩ exact| / k. This is THE number that decides
    whether an ANN index is shippable for a given corpus; at 100 TB
    the identical plan runs over a sampled query set (the exact
    baseline is linear in corpus × |queries|, so the audit costs one
    scored scan per method — affordable for hundreds of probe
    queries, which is how production recall dashboards are built).

    Output: (q_id, n_exact, lsh_hits, ivf_hits, lsh_recall,
    ivf_recall), one row per query vector.
    """
    # ONE shared (queries, corpus) lattice for all three retrieval
    # arms (r12, VERDICT #6 / guide §3.3): each arm's internal
    # _split re-scanned embeddings and recomputed the per-vector
    # norms — three corpus evaluations per execution. The corpus
    # side (vectors + norms) is lazily checkpointed so it
    # materializes once inside the audit job; the query side is 5
    # rows and stays a lazy broadcast. Values are the identical
    # arrays/norms every arm computed for itself (matched A/B at
    # sf0.1: tie, 1.72 vs 1.89 min under heavy variance — kept for
    # the one-corpus-pass shape at scale).
    from ensembl_lakehouse_spark.operators.similarity import _split

    queries, corpus = _split(spark, sf_dir)
    split = (
        queries.localCheckpoint(eager=False),
        corpus.localCheckpoint(eager=False),
    )
    exact = similarity_topk(spark, sf_dir, split=split).select(
        "q_id", "vec_id"
    )
    lsh = (
        similarity_lsh(spark, sf_dir, split=split)
        .select("q_id", "vec_id")
        .withColumn("lsh_hit", F.lit(1))
    )
    ivf = (
        similarity_ivf(spark, sf_dir, split=split)
        .select("q_id", "vec_id")
        .withColumn("ivf_hit", F.lit(1))
    )
    joined = exact.join(lsh, ["q_id", "vec_id"], "left").join(
        ivf, ["q_id", "vec_id"], "left"
    )
    n_exact = F.count(F.lit(1))
    lsh_hits = F.sum(F.coalesce(F.col("lsh_hit"), F.lit(0)))
    ivf_hits = F.sum(F.coalesce(F.col("ivf_hit"), F.lit(0)))
    return (
        joined.groupBy("q_id")
        .agg(
            n_exact.alias("n_exact"),
            lsh_hits.alias("lsh_hits"),
            ivf_hits.alias("ivf_hits"),
            (lsh_hits.cast("double") / n_exact).alias("lsh_recall"),
            (ivf_hits.cast("double") / n_exact).alias("ivf_recall"),
        )
        .orderBy("q_id")
    )


ANN_RECALL_AUDIT_SQL = f"""
WITH exact AS ({SIMILARITY_TOPK_SQL}),
lshr AS ({SIMILARITY_LSH_SQL}),
ivfr AS ({SIMILARITY_IVF_SQL})
SELECT e.q_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_hits,
       CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivf_hits,
       CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS lsh_recall,
       CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS ivf_recall
FROM exact e
LEFT JOIN lshr l ON e.q_id = l.q_id AND e.vec_id = l.vec_id
LEFT JOIN ivfr v ON e.q_id = v.q_id AND e.vec_id = v.vec_id
GROUP BY e.q_id
ORDER BY e.q_id
"""


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact Jaccard on every LSH candidate pair: the
    MinHash estimator's calibration curve, as data.

    For each candidate pair (same banded lattice as dedup_near, but
    WITHOUT the acceptance threshold — the estimator must be judged
    on misses too), emits the signature agreement count (the
    K-permutation MinHash estimate, E[n_match/K] = J) next to the
    exact shingle-set Jaccard. |est - exact| quantifies whether K=16
    is enough for the corpus' length distribution; production
    pipelines plot exactly this before trusting a threshold.

    Scale: identical cost shape to dedup_near itself (bucketed
    candidate generation, per-candidate verification) — the audit is
    as scalable as the operator it audits.

    Output: (doc_a, doc_b, n_match, est_jaccard, jaccard, abs_err).
    """
    # Checkpoints for the same multi-branch reuse reason as
    # dedup._near_pipeline: sig feeds bands AND both per-side joins;
    # capped feeds both sides of the pair self-join.
    s = _shingled(spark, sf_dir)
    sig = s.select(
        "doc_id", "sh", F.expr(_spark_signature("sh")).alias("sig")
    ).localCheckpoint()
    bands = sig.select(
        "doc_id",
        F.posexplode(F.expr(_spark_band_keys("sig"))).alias("band_idx", "band_key"),
    )
    capped = bands.withColumn(
        "bucket_n", F.expr("count(*) OVER (PARTITION BY band_idx, band_key)")
    ).where(F.col("bucket_n").between(2, BUCKET_CAP)).localCheckpoint()
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("sig").alias("sig_a")
    )
    gb = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("sig").alias("sig_b")
    )
    n_match = "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("n_match", F.expr(n_match))
        .withColumn("est_jaccard", F.expr(f"CAST(n_match AS DOUBLE) / {K_MINHASH}"))
        .withColumn(
            "jaccard",
            F.expr(
                "CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / "
                "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
            ),
        )
        .withColumn("abs_err", F.expr("abs(est_jaccard - jaccard)"))
        .select("doc_a", "doc_b", "n_match", "est_jaccard", "jaccard", "abs_err")
    )


MINHASH_CALIBRATION_SQL = f"""
WITH {_WORD_S_CTE}, hs AS (
  SELECT doc_id, sh, list_transform(sh, x -> {sql_md5_long31("x")}) AS h FROM s
), sig AS (
  SELECT doc_id, sh, {_duck_signature("h")} AS g FROM hs
), bands AS (
  SELECT doc_id,
         unnest(list_transform(range(0, {BANDS}),
           bi -> {{'band_idx': bi, 'band_key': {_duck_band_keys("g")}[bi + 1]}}),
           recursive := true)
  FROM sig
), capped AS (
  SELECT * FROM (
    SELECT doc_id, band_idx, band_key,
           count(*) OVER (PARTITION BY band_idx, band_key) AS bucket_n
    FROM bands)
  WHERE bucket_n BETWEEN 2 AND {BUCKET_CAP}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
), j AS (
  SELECT p.doc_a, p.doc_b,
         ga.sh AS sh_a, gb.sh AS sh_b, ga.g AS sig_a, gb.g AS sig_b
  FROM pairs p
  JOIN sig ga ON ga.doc_id = p.doc_a
  JOIN sig gb ON gb.doc_id = p.doc_b
), m AS (
  SELECT doc_a, doc_b,
         CAST(len(list_filter(list_transform(range(1, {K_MINHASH} + 1),
           i -> sig_a[i] = sig_b[i]), x -> x)) AS INTEGER) AS n_match,
         len(list_intersect(sh_a, sh_b)) AS n_common,
         len(sh_a) AS n_a, len(sh_b) AS n_b
  FROM j
)
SELECT doc_a, doc_b, n_match,
       CAST(n_match AS DOUBLE) / {K_MINHASH} AS est_jaccard,
       CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard,
       abs(CAST(n_match AS DOUBLE) / {K_MINHASH}
           - CAST(n_common AS DOUBLE) / (n_a + n_b - n_common)) AS abs_err
FROM m
"""


# ---------------------------------------------------------------------------
# Join-key skew audit
# ---------------------------------------------------------------------------

#: Key columns audited as join-key candidates.
SKEW_KEYS = ("l_partkey", "l_suppkey", "l_returnflag")


def skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-join-key skew profile over lineitem: distinct
    count, heaviest key's share, and the Gini impurity of the key
    distribution (1 - Σ p_k²) — the audit run BEFORE choosing a join
    strategy: top-share near 1 or impurity near 0 says "salt this
    key or broadcast the other side" (join_skew_salted is the cure
    this diagnostic prescribes).

    Gini impurity instead of Shannon entropy on purpose: entropy's
    ln() is a transcendental whose last ulp may differ between the
    engines' libm; Σ p² is one exact integer sum of squared counts
    divided once in double — hash-identical (the sketches.py
    HLL-estimator reasoning).

    Plan: per (column, key) counts via ONE unpivoted explode →
    partial agg (wordcount shape, unskewed because the audited key's
    own skew lands in the count values, not the shuffle keys) → per
    column: Σ c², max c, Σ c as BIGINTs → the three ratios. Linear,
    two exchanges, any number of audited columns in one pass.
    """
    # spread reverted (r11 A/B): +0.46 s at sf0.1 — the spread keys on
    # l_orderkey but this plan clusters on (col_name, key), so the
    # exchange is never absorbed downstream and is pure overhead
    li = load_table(spark, sf_dir, "lineitem").select(*SKEW_KEYS)
    structs = ", ".join(
        f"named_struct('col_name', '{c}', 'key', CAST({c} AS STRING))"
        for c in SKEW_KEYS
    )
    keyed = li.select(
        F.explode(F.expr(f"array({structs})")).alias("e")
    ).select("e.col_name", "e.key")
    counts = keyed.groupBy("col_name", "key").agg(
        F.count(F.lit(1)).alias("c")
    )
    # sum(c²) accumulates in DECIMAL(38,0): exact AND order-invariant
    # AND overflow-safe — int64 c² wraps (or ANSI-throws) once a key
    # holds ~3e9 rows, which a 100 TB fact table's low-cardinality
    # keys exceed. n_rows² likewise squares in double, never int64.
    return (
        counts.groupBy("col_name")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_count"),
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("sum_c2"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_distinct",
            (F.col("top_count").cast("double") / F.col("n_rows")).alias(
                "top_share"
            ),
            F.expr(
                "CAST(1.0 AS DOUBLE) - CAST(sum_c2 AS DOUBLE)"
                " / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))"
            ).alias("gini_impurity"),
        )
        .orderBy("col_name")
    )


SKEW_AUDIT_SQL = f"""
WITH keyed AS (
  SELECT e.col_name AS col_name, e.key AS key FROM (
    SELECT unnest([{", ".join(f"{{'col_name': '{c}', 'key': CAST({c} AS VARCHAR)}}" for c in SKEW_KEYS)}]) AS e
    FROM lineitem)
), counts AS (
  SELECT col_name, key, COUNT(*) AS c FROM keyed GROUP BY col_name, key
)
SELECT col_name,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_distinct,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_share,
       CAST(1.0 AS DOUBLE) - CAST(SUM(c * c) AS DOUBLE)
           / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS gini_impurity
FROM counts
GROUP BY col_name
ORDER BY col_name
"""
