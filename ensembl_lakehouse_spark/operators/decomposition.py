"""Embedding decomposition: distributed PCA over the ``embeddings``
table (EXT; iterative-algorithm family, like dedup_components).

An LLM-data pipeline runs PCA/whitening over its embedding store for
drift monitoring, compression, and IVF cell design. The scale shape is
the classic one:

- **Executors reduce the data to d×d.** Each Arrow batch contributes
  a partial Gram matrix and per-dimension sums; after the (i, j)
  partial aggregation the shuffle carries ≤ d² + d + 1 keyed rows
  TOTAL (d=64 → 4161), independent of corpus size. At 100 TB this is
  the only communication — the textbook "map-side Gram" trick.
- **The driver solves the tiny problem.** A dense symmetric
  eigensolve on the d×d covariance — O(d³) driver flops,
  microseconds at d=64; no distributed iteration needed, unlike
  graph CC where the STATE is big (that one iterates in the
  cluster, dedup_components). Power iteration was tried first and
  rejected by its own test: the fixture corpus is isotropic
  (λ1/λ2 ≈ 0.93), where power-method convergence is geometrically
  slow — a solver choice the eigenvalue pin caught immediately.

Determinism (the repo's oracle rule, applied to a no-oracle query):
float64 partial sums would be partition-order dependent, so batches
quantize values to fixed point (SCALE=1e6) and accumulate EXACT int64
partial products in row-chunks sized so no chunk can overflow; Spark
sums the partials in DECIMAL(38,0) (exact, order-invariant), so the
driver always eigensolves the identical matrix. Same run, same bits,
any partitioning — pinned against numpy in pytest.

No DuckDB oracle: an eigendecomposition is not SQL-expressible (the
driver records the weaker rows-only check, like dedup_components);
the numeric pin is tests/test_decomposition.py vs numpy.linalg.eigh
computed directly on the collected vectors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

#: Fixed-point quantization scale for exact accumulation.
PCA_SCALE = 1_000_000
#: Rows per exact-accumulation chunk. Bound: with |x| ≤ ~40 after
#: quantization guard below, |x_q| ≤ 4e7, product ≤ 1.6e15, ×512 rows
#: ≤ 8.2e17 < 2^63 — no chunk overflows int64.
PCA_CHUNK = 512
#: Components returned.
PCA_COMPONENTS = 2

_PARTIAL_SCHEMA = StructType(
    [
        StructField("i", LongType(), False),
        StructField("j", LongType(), False),
        StructField("psum", LongType(), False),
    ]
)


def _partial_grams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-chunk exact integer partials: Gram entries (i, j, Σx_i·x_j
    in fixed point squared), linear sums (i, -1, Σx_i in fixed
    point), and the row count (-1, -1, n)."""
    import numpy as np

    for pdf in batches:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        if mat.size == 0:
            continue
        # Quantize once; clip pathological magnitudes so the chunk
        # overflow bound holds (fixture embeddings are unit-ish).
        q = np.clip(np.rint(mat * PCA_SCALE), -4e7, 4e7).astype(np.int64)
        d = q.shape[1]
        iu = np.triu_indices(d)
        for s in range(0, q.shape[0], PCA_CHUNK):
            chunk = q[s : s + PCA_CHUNK]
            gram = chunk.T @ chunk  # int64, in-bounds by PCA_CHUNK choice
            lin = chunk.sum(axis=0)
            out = pd.DataFrame(
                {
                    "i": np.concatenate([iu[0], np.arange(d), [-1]]),
                    "j": np.concatenate([iu[1], np.full(d, -1), [-1]]),
                    "psum": np.concatenate([gram[iu], lin, [chunk.shape[0]]]),
                }
            )
            yield out


def _collect_moments(spark: SparkSession, sf_dir: str) -> tuple[list, int, "object"]:
    """Run the distributed reduction; returns (gram_rows, d, numpy)."""
    import numpy as np

    emb = load_spread(spark, sf_dir, "embeddings", "vec_id").select("embedding")
    partials = emb.mapInPandas(_partial_grams, schema=_PARTIAL_SCHEMA)
    # DECIMAL(38,0) sum: exact and partition-order invariant; int64
    # would overflow at ~10^5 × the fixture scale, decimal never does.
    moments = (
        partials.groupBy("i", "j")
        .agg(F.sum(F.col("psum").cast("decimal(38,0)")).alias("total"))
        .collect()  # bounded: d²/2 + d + 1 rows by construction
    )
    d = max(r.i for r in moments) + 1
    return moments, int(d), np

def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top PCA_COMPONENTS principal components of the embedding
    corpus: (component, dim, weight, eigenvalue, explained_ratio).

    See the module docstring for the scale/determinism story. Sign
    convention: each eigenvector's largest-|weight| entry is positive
    (eigenvectors are sign-ambiguous; pinning one makes the output a
    well-defined function of the data).
    """
    moments, d, np = _collect_moments(spark, sf_dir)

    n = 0
    gram = np.zeros((d, d), dtype=np.float64)
    lin = np.zeros(d, dtype=np.float64)
    scale2 = float(PCA_SCALE) * float(PCA_SCALE)
    for r in moments:
        total = int(r.total)
        if r.i == -1:
            n = total
        elif r.j == -1:
            lin[r.i] = total / PCA_SCALE
        else:
            gram[r.i, r.j] = total / scale2
            gram[r.j, r.i] = total / scale2
    mean = lin / n
    cov = gram / n - np.outer(mean, mean)

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = []
    for c in range(PCA_COMPONENTS):
        v = vecs[:, order[c]]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append((c, v, float(vals[order[c]])))

    trace = float(np.trace(cov))
    rows = [
        (c, int(dim), float(vec[dim]), lam, lam / trace)
        for c, vec, lam in comps
        for dim in range(d)
    ]
    return spark.createDataFrame(
        rows, "component int, dim int, weight double, eigenvalue double, explained_ratio double"
    )
