"""Composed curation pipeline (EXT capstone): the operators as one
dataset-curation flow, proving they compose into the thing a user
actually runs — quality-filter → exact-dedup → per-language quota →
deterministic sample — in a single declarative plan.

Stage order follows production practice: cheap map-only filters
first (quality — kills rows before any shuffle), dedup second
(fingerprint window), balancing quota third (needs the surviving
population), reproducible sampling last (so the sample rate applies
to the curated pool). Catalyst pipelines the whole thing: one scan
of documents, two window shuffles (fp_md5, lang), no joins.

Every stage reuses the SAME expression builders as its standalone
operator (functions.text norm constants, md5 fingerprint, quota
window, hash-bucket sample), so this query's oracle doubles as an
integration check that the pieces don't drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.text import (
    NORM_DUCK_SQL,
    NORM_SPARK_SQL,
    sql_word_shingles,
    word_shingles,
)
from ensembl_lakehouse_spark.operators.text import STOPWORDS
from ensembl_lakehouse_spark.sources.tables import load_table

#: Pipeline knobs (each stage's standalone twin documents the why).
QUALITY_MIN = 0.5
QUOTA_PER_LANG = 30
SAMPLE_PCT = 50


def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → keep quality ≥ 0.5 → keep canonical exact-dup
    representative → keep first QUOTA_PER_LANG per language → keep
    the deterministic SAMPLE_PCT% hash sample.

    Output: (doc_id, lang, quality_score, rn, sample_bucket) of the
    surviving curated set."""
    stop_quoted = ", ".join(f"'{s}'" for s in STOPWORDS)
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .withColumn("toks", F.split(F.trim("text"), r"\s+"))
    )
    scored = docs.select(
        "doc_id",
        "lang",
        (
            (
                F.expr(f"size(filter(toks, x -> x IN ({stop_quoted})))").cast("double")
                / F.size("toks")
            )
            * 0.25
            + (F.size(F.array_distinct("toks")).cast("double") / F.size("toks")) * 0.25
            + (
                F.lit(1.0)
                - (
                    F.length("text") - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
                ).cast("double")
                / F.length("text")
            )
            * 0.25
            + (F.least(F.size("toks"), F.lit(100)).cast("double") / F.lit(100.0)) * 0.25
        ).alias("quality_score"),
        F.expr(
            f"cast(conv(substring(md5({NORM_SPARK_SQL}), 1, 15), 16, 10) AS bigint)"
        ).alias("fp_md5"),
    ).where(F.col("quality_score") >= QUALITY_MIN)
    canonical = scored.withColumn(
        "min_doc", F.expr("min(doc_id) OVER (PARTITION BY fp_md5)")
    ).where(F.col("doc_id") == F.col("min_doc"))
    quota = canonical.withColumn(
        "rn", F.expr("row_number() OVER (PARTITION BY lang ORDER BY doc_id)")
    ).where(F.col("rn") <= QUOTA_PER_LANG)
    return (
        quota.withColumn(
            "sample_bucket",
            F.expr(
                "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 100"
            ),
        )
        .where(F.col("sample_bucket") < SAMPLE_PCT)
        .select("doc_id", "lang", "quality_score", "rn", "sample_bucket")
    )


PIPELINE_CURATION_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), scored AS (
  SELECT doc_id, lang,
    ((CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{s}'" for s in STOPWORDS)}))) AS DOUBLE) / len(toks)) * 0.25
     + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.25
     + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 0.25
     + (CAST(least(len(toks), 100) AS DOUBLE) / 100.0) * 0.25) AS quality_score,
    CAST('0x' || substr(md5({NORM_DUCK_SQL}), 1, 15) AS BIGINT) AS fp_md5
  FROM t
), q AS (
  SELECT * FROM scored WHERE quality_score >= {QUALITY_MIN}
), canonical AS (
  SELECT * FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY fp_md5) AS min_doc FROM q)
  WHERE doc_id = min_doc
), quota AS (
  SELECT * FROM (
    SELECT doc_id, lang, quality_score,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
    FROM canonical)
  WHERE rn <= {QUOTA_PER_LANG}
)
SELECT doc_id, lang, quality_score, rn,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS sample_bucket
FROM quota
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < {SAMPLE_PCT}
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

#: Every BENCH_MOD-th doc_id stands in for the held-out benchmark set.
BENCH_MOD = 50
#: Word n-gram length for overlap detection. Production corpora use
#: 8–13-gram matching (GPT-3/PaLM decontamination); this fixture's
#: ~200-word synthetic vocabulary saturates much shorter n-grams
#: (3-grams flag half the corpus, 5-grams almost none), so 4 plays
#: the same discriminating role here. A knob, not a constant of the
#: algorithm.
DECONTAM_N = 4


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination: find corpus documents that
    share any word DECONTAM_N-gram with the benchmark set — the
    overlap check every LLM training pipeline runs against its eval
    suites before training (and the report an auditor asks for:
    which docs, how many distinct overlapping n-grams, what fraction
    of the doc's n-grams).

    Output: (doc_id, n_shingles, n_contaminated, contamination_frac)
    for contaminated corpus docs only.

    Plan — the asymmetry IS the design: the corpus is 100 TB but a
    benchmark suite is megabytes, so the benchmark's distinct shingle
    set is collected map-side and BROADCAST (explicit hint — this
    side is bounded by construction, the one case where hard-coding
    beats AQE's sampling). The corpus side then never shuffles raw
    text: explode is map-side, the hash-join probe is map-side, and
    the only exchange carries pre-aggregated (doc_id, hit-count)
    rows for contaminated docs alone.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .withColumn("toks", F.split(F.trim("text"), r"\s+"))
        .select(
            "doc_id", word_shingles("toks", DECONTAM_N).alias("shingles")
        )
        .withColumn("n_shingles", F.size("shingles"))
        # Both the benchmark branch and the corpus branch consume the
        # shingled docs; checkpoint so the tokenize+shingle map stage
        # runs once (the _near_pipeline reasoning; measured ~2x here).
        .localCheckpoint()
    )
    bench = (
        docs.where(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus = docs.where(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corpus.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.col("n_contaminated").cast("double") / F.col("n_shingles"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), d AS (
  SELECT doc_id, {sql_word_shingles("toks", DECONTAM_N)} AS shingles FROM t
), sh AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle FROM d
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0
), hits AS (
  SELECT sh.doc_id, sh.n_shingles, sh.shingle
  FROM sh JOIN bench USING (shingle)
  WHERE sh.doc_id % {BENCH_MOD} != 0
)
SELECT doc_id, MAX(n_shingles) AS n_shingles, COUNT(*) AS n_contaminated,
       CAST(COUNT(*) AS DOUBLE) / MAX(n_shingles) AS contamination_frac
FROM hits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Stratified train/val/test split
# ---------------------------------------------------------------------------

#: Split proportions in tenths: train 8/10, val 1/10, test 1/10.
SPLIT_TRAIN_TENTHS = 8
SPLIT_VAL_TENTHS = 9  # cumulative: ranks in (8/10, 9/10] are val


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment: within
    each language stratum, documents are ranked by an identity hash
    and cut at exact 80/10/10 boundaries — every training-data
    pipeline's split step, reproducible on any cluster and immune
    to partitioning (unlike ``randomSplit``, whose draw depends on
    partition layout and seed plumbing).

    The boundary test is pure integer arithmetic (``rank*10 <=
    n*8``) — no float proportions to disagree on. Ranking within a
    stratum, not global hashing, guarantees EXACT per-stratum
    proportions (a plain hash-mod split only approximates them on
    small strata).

    Scale: one shuffle on lang. Stratum cardinality is bounded
    (|languages|), so per-partition sort memory is the constraint —
    the same documented skew caveat as quota_per_group: a dominant
    language concentrates in one task; salt the rank (two-phase
    rank-then-offset) when a stratum outgrows a task.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint)"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    n = F.count(F.lit(1)).over(Window.partitionBy("lang"))
    rn = F.row_number().over(w)
    return (
        docs.select("doc_id", "lang", h.alias("h"))
        .select(
            "doc_id",
            "lang",
            rn.alias("stratum_rank"),
            n.alias("stratum_n"),
            F.when(rn * 10 <= n * SPLIT_TRAIN_TENTHS, F.lit("train"))
            .when(rn * 10 <= n * SPLIT_VAL_TENTHS, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


SPLIT_TRAIN_VAL_TEST_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM documents
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS stratum_rank,
         count(*) OVER (PARTITION BY lang) AS stratum_n
  FROM h
)
SELECT doc_id, lang, stratum_rank, stratum_n,
       CASE WHEN stratum_rank * 10 <= stratum_n * {SPLIT_TRAIN_TENTHS} THEN 'train'
            WHEN stratum_rank * 10 <= stratum_n * {SPLIT_VAL_TENTHS} THEN 'val'
            ELSE 'test' END AS split
FROM r
"""


#: Target mixture weights by source (integer ratios — heavy sources
#: get 3 units, the long tail 1). Integer weights keep every derived
#: quantity exact: no float proportions anywhere.
MIX_HEAVY_SOURCES = ("src0", "src1", "src2", "src3")
MIX_HEAVY_WEIGHT = 3
MIX_TAIL_WEIGHT = 1


def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture downsampling: select the LARGEST corpus that
    hits the target per-source mixture exactly, without upsampling —
    the "data mixing" step of every LLM training-data pipeline
    (web:books:code ratios), downstream of dedup and quality
    filtering.

    Integer-exact construction: with integer weights w_s, the
    bottleneck source fixes ``units = min_s floor(n_s / w_s)`` and
    each source keeps exactly ``w_s · units`` rows — no float
    proportion ever materializes, so both engines agree row-for-row.
    WHICH rows survive is deterministic too: rows rank within their
    source by (md5(doc_id), doc_id) and the lowest ranks win — the
    same reproducible-hash-order contract as sample_hash/
    quota_per_group.

    Plan: per-source counts (partial-agg, |sources| rows) → 1-row
    ``units`` scalar broadcast back → per-source row_number window →
    rank filter. Two shuffles total (count agg + window sort).
    At 100 TB the per-source sort is the knob: swap the exact
    row_number for a hash-threshold predicate (rank-free, map-only,
    ±binomial noise on the kept count) once corpus sizes make
    per-source sorts expensive — the mixture math above is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = F.when(
        F.col("source").isin(*MIX_HEAVY_SOURCES), F.lit(MIX_HEAVY_WEIGHT)
    ).otherwise(F.lit(MIX_TAIL_WEIGHT))
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    units = counts.select(
        F.min(
            F.floor(
                F.col("n_source")
                / F.when(
                    F.col("source").isin(*MIX_HEAVY_SOURCES), F.lit(MIX_HEAVY_WEIGHT)
                ).otherwise(F.lit(MIX_TAIL_WEIGHT))
            )
        ).alias("units")
    )
    ranked = docs.withColumn(
        "rk",
        F.expr(
            "row_number() OVER (PARTITION BY source "
            "ORDER BY md5(cast(doc_id AS string)), doc_id)"
        ),
    )
    return (
        ranked.join(F.broadcast(units))
        .where(F.col("rk") <= w * F.col("units"))
        .select("doc_id", "source", (w * F.col("units")).alias("source_quota"))
        .orderBy("source", "doc_id")
    )


MIX_SOURCES_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         CASE WHEN source IN {MIX_HEAVY_SOURCES} THEN {MIX_HEAVY_WEIGHT}
              ELSE {MIX_TAIL_WEIGHT} END AS wt
  FROM documents
), counts AS (
  SELECT source, ANY_VALUE(wt) AS wt, COUNT(*) AS n_source FROM w GROUP BY source
), u AS (
  SELECT MIN(CAST(FLOOR(n_source / wt) AS BIGINT)) AS units FROM counts
), ranked AS (
  SELECT doc_id, source, wt,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM w
)
SELECT doc_id, source, wt * units AS source_quota
FROM ranked, u
WHERE rk <= wt * units
ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# Corpus data card
# ---------------------------------------------------------------------------

def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus data card: the summary table a
    dataset release ships (counts, token mass, length profile, exact
    -duplicate rate) — the composition capstone over the text/dedup
    signal families, and the report a mixture designer (mix_sources)
    reads before choosing weights.

    Plan: one map-side pass computes per-doc length/token signals and
    the md5 fingerprint; a window on the fingerprint marks exact
    duplicates (the dedup_exact lattice); ONE final partial agg per
    (lang, source). Shuffle volume: |docs| narrow rows into the
    fingerprint window, then group-count rows — linear, unskewed
    (fixture sources are uniform; a skewed real source key would
    ride the same salting pattern as join_skew_salted).
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.length("text").alias("n_chars"),
            F.size(F.expr("split(trim(text), '\\\\s+')")).alias("n_tokens"),
            F.expr(
                f"cast(conv(substring(md5({NORM_SPARK_SQL}), 1, 15), 16, 10) AS bigint)"
            ).alias("fp_md5"),
        )
        .withColumn(
            "is_dup",
            F.expr("count(*) OVER (PARTITION BY fp_md5) > 1"),
        )
    )
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_doc_tokens"
            ),
            F.min("n_tokens").alias("min_doc_tokens"),
            F.max("n_tokens").alias("max_doc_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_exact_dup"),
            (
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("exact_dup_frac"),
        )
        .orderBy("lang", "source")
    )


CORPUS_DATACARD_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, source,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         CAST('0x' || substr(md5({NORM_DUCK_SQL}), 1, 15) AS BIGINT) AS fp_md5
  FROM documents WHERE length(trim(text)) > 0
), flagged AS (
  SELECT *, count(*) OVER (PARTITION BY fp_md5) > 1 AS is_dup FROM d
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_doc_tokens,
       MIN(n_tokens) AS min_doc_tokens,
       MAX(n_tokens) AS max_doc_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS exact_dup_frac
FROM flagged
GROUP BY lang, source
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# Privacy: k-anonymity audit
# ---------------------------------------------------------------------------

#: Quasi-identifier columns audited on the customer table and the
#: anonymity threshold.
QI_COLS = ("c_nationkey", "c_mktsegment")
K_ANON = 5


def privacy_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers: per
    equivalence class (distinct QI tuple), its size and whether it
    violates k >= K_ANON — plus each class's share of the table. A
    release gate runs this BEFORE exporting any row-level dataset:
    classes smaller than k re-identify individuals by joining on the
    quasi-identifiers alone (Sweeney's k-anonymity model).

    Plan: one groupBy on the QI tuple (the equivalence-class
    partition), one 1-row total broadcast back. Linear; class-size
    skew is the data's own property and lands in values, not keys.
    """
    cust = load_table(spark, sf_dir, "customer").select(*QI_COLS)
    classes = cust.groupBy(*QI_COLS).agg(F.count(F.lit(1)).alias("class_size"))
    total = cust.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        classes.crossJoin(F.broadcast(total))
        .select(
            *QI_COLS,
            "class_size",
            (F.col("class_size") < K_ANON).alias("violates_k"),
            (F.col("class_size").cast("double") / F.col("n_total")).alias(
                "class_share"
            ),
        )
        .orderBy(*QI_COLS)
    )


PRIVACY_KANON_AUDIT_SQL = f"""
WITH classes AS (
  SELECT {", ".join(QI_COLS)}, COUNT(*) AS class_size
  FROM customer GROUP BY {", ".join(QI_COLS)}
), total AS (
  SELECT COUNT(*) AS n_total FROM customer
)
SELECT {", ".join(QI_COLS)}, class_size,
       class_size < {K_ANON} AS violates_k,
       CAST(class_size AS DOUBLE) / n_total AS class_share
FROM classes CROSS JOIN total
ORDER BY {", ".join(QI_COLS)}
"""


# ---------------------------------------------------------------------------
# Deterministic epoch shuffling
# ---------------------------------------------------------------------------

#: Training epochs materialized by the demo query.
N_EPOCHS = 2


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data permutation: for each
    epoch, every document gets a position from the rank of its
    md5(epoch|doc_id) — a different, reproducible shuffle per epoch
    with no RNG state to coordinate across executors. This is how a
    distributed loader shuffles 100 TB: the permutation is a pure
    function of (seed, key), so any worker can compute its own
    slice's order without a central shuffle service, and a resumed
    job regenerates the identical order.

    Plan: explode epochs (map-side 1→N_EPOCHS) → per-epoch
    row_number over the hash order. The window is the one exchange;
    at scale the loader replaces the global row_number with
    hash-ordered range partitioning (the same ordering, no total
    order materialized).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = docs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {N_EPOCHS - 1})")).alias("epoch"),
    ).withColumn(
        "h",
        F.expr(
            "CAST(conv(substring(md5(concat(epoch, '|', doc_id)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ),
    )
    return (
        epochs.withColumn(
            "position",
            F.expr(
                "row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)"
            ),
        )
        .select("epoch", "position", "doc_id")
        .orderBy("epoch", "position")
    )


EPOCH_SHUFFLE_SQL = f"""
WITH e AS (
  SELECT doc_id, r.range AS epoch
  FROM documents CROSS JOIN range({N_EPOCHS}) r
), h AS (
  SELECT doc_id, epoch,
         CAST('0x' || substr(md5(concat(epoch, '|', doc_id)), 1, 15) AS BIGINT) AS h
  FROM e
)
SELECT epoch, row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS position,
       doc_id
FROM h
ORDER BY epoch, position
"""


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage retention through the curation pipeline — the
    funnel report every corpus-curation run publishes next to its
    output ("we started with N docs; the quality gate kept X%, dedup
    kept Y%, ..."): one row of monotone BIGINT survivor counts for
    raw → nonblank → quality ≥ 0.5 → exact-dup canonical → per-lang
    quota → hash sample, mirroring pipeline_curation stage for stage
    (its count pinned equal to n_sampled in tests/test_pipeline* —
    the funnel can never drift from the pipeline it reports on).

    Plan: ONE scan computes per-doc survival flags; the stages that
    are windows in the pipeline become CONDITIONAL windows over the
    full table (min(CASE WHEN prior-stage THEN doc_id END) per
    fingerprint; running count of prior-stage survivors per lang),
    then one 1-row aggregate. Shuffle volume: |docs| narrow rows
    into each of the two window exchanges — identical to running the
    pipeline itself, and 6× cheaper than counting each stage with
    its own scan.
    """
    stop_quoted = ", ".join(f"'{s}'" for s in STOPWORDS)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.split(F.trim("text"), r"\s+").alias("toks"),
    )
    flagged = docs.select(
        "doc_id",
        "lang",
        (F.length(F.trim("text")) > 0).alias("f_nonblank"),
        F.expr(
            f"""CASE WHEN length(trim(text)) > 0 THEN
              (CAST(size(filter(toks, x -> x IN ({stop_quoted}))) AS DOUBLE) / size(toks)) * 0.25
              + (CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks)) * 0.25
              + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS DOUBLE) / length(text)) * 0.25
              + (CAST(least(size(toks), 100) AS DOUBLE) / 100.0) * 0.25
            END >= {QUALITY_MIN} AND length(trim(text)) > 0"""
        ).alias("f_quality"),
        F.expr(
            f"cast(conv(substring(md5({NORM_SPARK_SQL}), 1, 15), 16, 10) AS bigint)"
        ).alias("fp_md5"),
        F.expr(
            "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 100"
        ).alias("sample_bucket"),
    )
    windowed = flagged.select(
        "*",
        F.expr(
            "min(CASE WHEN f_quality THEN doc_id END)"
            " OVER (PARTITION BY fp_md5) = doc_id AND f_quality"
        ).alias("f_canonical"),
    )
    windowed = windowed.select(
        "*",
        F.expr(
            "CASE WHEN f_canonical THEN"
            " sum(CASE WHEN f_canonical THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY lang ORDER BY doc_id)"
            f" <= {QUOTA_PER_LANG} ELSE false END"
        ).alias("f_quota"),
    )
    return windowed.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("f_nonblank").cast("bigint")).alias("n_nonblank"),
        F.sum(F.col("f_quality").cast("bigint")).alias("n_quality"),
        F.sum(F.col("f_canonical").cast("bigint")).alias("n_unique"),
        F.sum(F.col("f_quota").cast("bigint")).alias("n_quota"),
        F.sum(
            (F.col("f_quota") & (F.col("sample_bucket") < SAMPLE_PCT)).cast("bigint")
        ).alias("n_sampled"),
    )


CURATION_FUNNEL_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), flagged AS (
  SELECT doc_id, lang,
    length(trim(text)) > 0 AS f_nonblank,
    COALESCE(CASE WHEN length(trim(text)) > 0 THEN
      ((CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{s}'" for s in STOPWORDS)}))) AS DOUBLE) / len(toks)) * 0.25
       + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.25
       + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text)) * 0.25
       + (CAST(least(len(toks), 100) AS DOUBLE) / 100.0) * 0.25)
    END >= {QUALITY_MIN}, FALSE) AS f_quality,
    CAST('0x' || substr(md5({NORM_DUCK_SQL}), 1, 15) AS BIGINT) AS fp_md5,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS sample_bucket
  FROM t
), canon AS (
  SELECT *,
    COALESCE(min(CASE WHEN f_quality THEN doc_id END)
      OVER (PARTITION BY fp_md5) = doc_id AND f_quality, FALSE) AS f_canonical
  FROM flagged
), quota AS (
  SELECT *,
    CASE WHEN f_canonical THEN
      sum(CASE WHEN f_canonical THEN 1 ELSE 0 END)
        OVER (PARTITION BY lang ORDER BY doc_id) <= {QUOTA_PER_LANG}
    ELSE FALSE END AS f_quota
  FROM canon
)
SELECT COUNT(*) AS n_raw,
       CAST(SUM(CASE WHEN f_nonblank THEN 1 ELSE 0 END) AS BIGINT) AS n_nonblank,
       CAST(SUM(CASE WHEN f_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN f_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN f_quota THEN 1 ELSE 0 END) AS BIGINT) AS n_quota,
       CAST(SUM(CASE WHEN f_quota AND sample_bucket < {SAMPLE_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM quota
"""


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing weights
# ---------------------------------------------------------------------------

def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights at τ = 0.5 — the
    multilingual/multi-source rebalancing rule (sample source s with
    probability ∝ n_s^τ) that upweights tail sources relative to
    proportional sampling without going fully uniform; the published
    recipe behind mT5/XLM-R style corpus mixing. Reported per
    source: raw proportional share, the τ=0.5 share, and the uniform
    share, all in basis points, plus the lift the temperature gives
    the source vs proportional.

    Exactness: n^0.5 = √n, and SQRT on a double is IEEE-754
    correctly rounded (algebraic, not transcendental), so
    s = FLOOR(√n · 1000) is bit-identical cross-engine; every share
    is then an integer DIV over BIGINT sums of those s — no float
    accumulation, one shared expression template (memory:
    oracle-determinism-rules). Other temperatures need n^τ via
    exp/ln — out of the oracle contract; τ=0.5 is the published
    default and stays exact.

    Plan: one partial agg to |sources| rows, one 1-row-broadcast
    total via an empty-frame window; everything after the first agg
    is dim-bounded. The 100 TB cost is the map-side count combine.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scaled = counts.withColumn(
        "s_e3",
        F.expr("CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT)"),
    )
    return (
        scaled.select(
            "source",
            "n_docs",
            "s_e3",
            F.expr(
                "(n_docs * 10000) DIV SUM(n_docs) OVER ()"
            ).alias("prop_bp"),
            F.expr("(s_e3 * 10000) DIV SUM(s_e3) OVER ()").alias("temp_bp"),
            F.expr(
                "10000 DIV COUNT(*) OVER ()"
            ).alias("uniform_bp"),
        )
        .withColumn(
            "lift_bp",
            F.expr(
                "CASE WHEN prop_bp > 0 "
                "THEN (temp_bp * 10000) DIV prop_bp - 10000 END"
            ),
        )
        .orderBy("source")
    )


MIX_TEMPERATURE_WEIGHTS_SQL = """
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), scaled AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT) AS s_e3
  FROM counts
), shares AS (
  SELECT source, n_docs, s_e3,
         (n_docs * 10000) // CAST(SUM(n_docs) OVER () AS BIGINT) AS prop_bp,
         (s_e3 * 10000) // CAST(SUM(s_e3) OVER () AS BIGINT) AS temp_bp,
         CAST(10000 AS BIGINT) // CAST(COUNT(*) OVER () AS BIGINT)
           AS uniform_bp
  FROM scaled
)
SELECT source, n_docs, s_e3, prop_bp, temp_bp, uniform_bp,
       CASE WHEN prop_bp > 0
            THEN (temp_bp * 10000) // prop_bp - 10000 END AS lift_bp
FROM shares
ORDER BY source
"""
