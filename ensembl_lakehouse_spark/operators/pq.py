"""Product-quantization ANN (EXT X2): PQ encode + ADC scan + exact
rerank — the FAISS ``IVFPQ``/``PQ`` serving architecture, expressed
as a Catalyst plan.

The reference has no vector surface (its only execution is delegated
single-table SQL, app/main.py:479); this is the north-star
"similarity search at 100 TB" storage/compute trade: a 64-dim float32
vector (256 B) becomes M=8 one-byte codes (8 B, 32x), and each
query scores a corpus row with M table lookups instead of a 64-dim
dot product.

Scale design:

- **Encoding is map-only.** The codebooks are module constants
  interpolated into the plan (like similarity.PLANES), so the
  encode stage is whole-stage-codegen arithmetic over each row —
  zero shuffle, linear scan, exactly how an offline PQ index build
  distributes.
- **ADC is the lookup trick, declaratively.** Per query a lookup
  table LUT[m][k] = ||q_m - cb[m][k]||^2 is computed ONCE (M*K
  doubles), broadcast with the query row, and each corpus row's
  approximate distance is ``sum_m LUT[m][code_m]`` — M element_at
  calls, no float vector math on the scan side. This is the
  asymmetric-distance computation from Jegou et al. 2011.
- **Shortlist + exact rerank.** ADC ranks a SHORTLIST per query
  (WindowGroupLimit: per-task k-row heap before the one exchange),
  then ONLY the shortlist is re-scored with exact cosine against
  the original vectors — the standard two-stage serving layout, so
  reported neighbors are exactly ranked and approximation only
  affects recall, never the reported metric.

Determinism: codebooks are md5-derived (hashlib, generated in
Python, interpolated into BOTH engines' SQL); argmin uses
first-position-of-min (leftmost tie-break) in both engines; every
float reduction is index-ordered. The fixture corpus is isotropic,
so recall against the exact baseline is modest at these (M, K) —
same caveat as the LSH/IVF variants, measured in tests; a real
(clustered) corpus with trained codebooks recalls far higher with
the identical plan shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.vectors import sql_cosine
from ensembl_lakehouse_spark.operators.similarity import (
    DIM,
    N_QUERIES,
    TOP_K,
    _dot_expr,
    _split,
)

#: Subquantizers (subvectors); DIM must divide evenly.
PQ_M = 8
#: Sub-dimension per subquantizer.
PQ_SUB = DIM // PQ_M
#: Centroids per codebook (codes are 0..PQ_K-1, one byte at K<=256).
PQ_K = 16
#: ADC shortlist size fed to the exact rerank.
PQ_SHORTLIST = 50


def _codebooks() -> list[list[list[float]]]:
    """cb[m][k][d] in [-0.3, 0.3], md5-derived — reproducible
    everywhere, identical in the Spark plan and the oracle SQL.
    The range matches the fixture component spread (~U(-0.5, 0.5));
    deployments swap in k-means-trained codebooks, same plan."""
    out = []
    for m in range(PQ_M):
        book = []
        for k in range(PQ_K):
            row = []
            for d in range(PQ_SUB):
                h = int(hashlib.md5(f"pq|{m}|{k}|{d}".encode()).hexdigest()[:8], 16)
                row.append((h % 6001 - 3000) / 10000.0)
            book.append(row)
        out.append(book)
    return out


CODEBOOKS = _codebooks()


def _lit_vec(vals: list[float], spark: bool) -> str:
    inner = ", ".join(f"cast({v!r} AS double)" for v in vals)
    return f"array({inner})" if spark else f"[{inner}]"


def _sub_dist_spark(vec: str, m: int, k: int) -> str:
    """Squared L2 between subvector m of ``vec`` and cb[m][k]."""
    sub = f"slice({vec}, {m * PQ_SUB + 1}, {PQ_SUB})"
    cb = _lit_vec(CODEBOOKS[m][k], spark=True)
    return (
        f"aggregate(zip_with({sub}, {cb}, "
        f"(x, c) -> (cast(x AS double) - c) * (cast(x AS double) - c)), "
        f"cast(0 AS double), (a, v) -> a + v)"
    )


def _sub_dist_duck(vec: str, m: int, k: int) -> str:
    sub = f"list_slice({vec}, {m * PQ_SUB + 1}, {(m + 1) * PQ_SUB})"
    cb = _lit_vec(CODEBOOKS[m][k], spark=False)
    return (
        f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, {PQ_SUB} + 1), "
        f"i -> ({sub}[i]::DOUBLE - {cb}[i]) * ({sub}[i]::DOUBLE - {cb}[i]))), "
        f"(a, v) -> a + v)"
    )


def _codes_spark(vec: str) -> str:
    """array<int> of PQ_M codes: per m, leftmost argmin over the
    K per-centroid squared distances (0-based)."""
    per_m = []
    for m in range(PQ_M):
        dists = f"array({', '.join(_sub_dist_spark(vec, m, k) for k in range(PQ_K))})"
        per_m.append(
            f"transform(array({dists}), ds -> "
            f"cast(array_position(ds, array_min(ds)) - 1 AS int))[0]"
        )
    return f"array({', '.join(per_m)})"


def _codes_duck(vec: str) -> str:
    per_m = []
    for m in range(PQ_M):
        dists = f"[{', '.join(_sub_dist_duck(vec, m, k) for k in range(PQ_K))}]"
        per_m.append(
            f"list_transform([{dists}], ds -> "
            f"CAST(list_position(ds, list_min(ds)) - 1 AS INTEGER))[1]"
        )
    return f"[{', '.join(per_m)}]"


def _lut_spark(qvec: str) -> str:
    """array<array<double>>: LUT[m+1][k+1] = ||q_m - cb[m][k]||^2."""
    rows = []
    for m in range(PQ_M):
        rows.append(
            f"array({', '.join(_sub_dist_spark(qvec, m, k) for k in range(PQ_K))})"
        )
    return f"array({', '.join(rows)})"


def _lut_duck(qvec: str) -> str:
    rows = []
    for m in range(PQ_M):
        rows.append(
            f"[{', '.join(_sub_dist_duck(qvec, m, k) for k in range(PQ_K))}]"
        )
    return f"[{', '.join(rows)}]"


def similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encoded ANN top-k: encode the corpus to PQ_M codes,
    ADC-score every (query, corpus) pair with M lookups into the
    query's broadcast LUT, shortlist PQ_SHORTLIST per query, exact
    cosine rerank, report the TOP_K.

    Output: (q_id, rank, vec_id, label, cosine, adc_dist) — rank by
    exact cosine within the shortlist; adc_dist preserved so the
    approximation error is auditable per neighbor.
    """
    queries, corpus = _split(spark, sf_dir)
    encoded = corpus.select(
        "vec_id", "label", "embedding", "c_nrm",
        F.expr(_codes_spark("embedding")).alias("codes"),
    )
    luts = queries.select(
        "q_id", "q_vec", "q_nrm", F.expr(_lut_spark("q_vec")).alias("lut")
    )
    adc = (
        encoded.crossJoin(F.broadcast(luts))
        .withColumn(
            "adc_dist",
            F.expr(
                "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, c + 1)), "
                "cast(0 AS double), (a, v) -> a + v)"
            ),
        )
        .withColumn(
            "adc_rank",
            F.expr(
                "row_number() OVER (PARTITION BY q_id "
                "ORDER BY adc_dist ASC, vec_id ASC)"
            ),
        )
        .where(F.col("adc_rank") <= PQ_SHORTLIST)
    )
    return (
        adc.withColumn(
            "cosine", F.expr(f"{_dot_expr('q_vec', 'embedding')} / (q_nrm * c_nrm)")
        )
        .withColumn(
            "rank",
            F.expr(
                "row_number() OVER (PARTITION BY q_id "
                "ORDER BY cosine DESC, vec_id ASC)"
            ),
        )
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "vec_id", "label", "cosine", "adc_dist")
    )


def _pq_sql() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
  WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}
), encoded AS (
  SELECT vec_id, label, embedding, {_codes_duck("embedding")} AS codes FROM c
), luts AS (
  SELECT q_id, q_vec, {_lut_duck("q_vec")} AS lut FROM q
), adc AS (
  SELECT q_id, q_vec, vec_id, label, embedding, adc_dist,
         row_number() OVER (PARTITION BY q_id
           ORDER BY adc_dist ASC, vec_id ASC) AS adc_rank
  FROM (
    SELECT l.q_id, l.q_vec, e.vec_id, e.label, e.embedding,
           list_reduce(list_concat([CAST(0 AS DOUBLE)],
             list_transform(range(1, {PQ_M} + 1),
               m -> l.lut[m][e.codes[m] + 1])),
             (a, v) -> a + v) AS adc_dist
    FROM encoded e CROSS JOIN luts l)
), short AS (
  SELECT * FROM adc WHERE adc_rank <= {PQ_SHORTLIST}
), ranked AS (
  SELECT q_id, vec_id, label, adc_dist,
         {sql_cosine("q_vec", "embedding")} AS cosine,
         row_number() OVER (PARTITION BY q_id
           ORDER BY {sql_cosine("q_vec", "embedding")} DESC, vec_id ASC) AS rank
  FROM short
)
SELECT q_id, rank, vec_id, label, cosine, adc_dist
FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_PQ_SQL = _pq_sql()
