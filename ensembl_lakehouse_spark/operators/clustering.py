"""Distributed k-means over ``embeddings`` (EXT X2-adjacent): KM_ITERS
Lloyd iterations unrolled into ONE declarative plan, with a full
DuckDB oracle — the clustering primitive behind IVF cell training,
SemDeDup partitioning, and data-mixture analysis.

The reference has no iterative computation at all (single-statement
delegation, app/main.py:479); Spark's native fit for Lloyd's is
exactly this shape:

- **Assignment is map-only.** The K current centroids travel as ONE
  broadcast row holding an ``array<struct<cid, vec>>``; each data
  row computes its nearest centroid with an in-expression argmin
  (leftmost-min = lowest cid on ties) — no per-vector window, no
  shuffle of the corpus, whole-stage codegen end to end.
- **Update is a partial agg.** New centroids are per-(cid, dim)
  FP_SCALE fixed-point BIGINT sums (partition-order invariant — the
  multimodal_centroid determinism trick) reassembled into arrays
  via sorted collect; each iteration's shuffle therefore moves at
  most K*DIM tiny rows regardless of corpus size. At 100 TB you
  cache the input once and every iteration is scan + partial-agg —
  the same loop MLlib's KMeans runs, minus its sampled init.
- **Unrolled, not driver-looped.** KM_ITERS is fixed, so the whole
  computation is one lazy plan both engines can execute identically
  — which is what makes a value-exact SQL oracle possible for an
  *iterative* algorithm (the DuckDB twin unrolls the same CTE
  chain). Convergence-based stopping would need a driver loop on a
  1-row count per round: same plan per round, just re-issued.

Determinism: init centroids are md5-derived literals interpolated
into both engines (similarity.PLANES precedent); argmin ties break
leftmost (= lowest cid, both engines); means divide BIGINT sums in
one fixed expression shape; inertia is a fixed-point BIGINT sum.
Empty clusters would simply drop out of the next round's centroid
array in BOTH engines identically (the md5 init keeps all K
populated on the fixture — asserted in tests).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.operators.similarity import DIM
from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

#: Clusters.
KM_K = 8
#: Unrolled Lloyd iterations.
KM_ITERS = 3
#: Fixed-point scale for centroid sums / inertia (micro-units).
KM_FP = 1_000_000


def _init_centroids() -> list[list[float]]:
    """K md5-derived starting centroids in [-0.3, 0.3]^DIM."""
    out = []
    for k in range(KM_K):
        row = []
        for d in range(DIM):
            h = int(hashlib.md5(f"km|{k}|{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 6001 - 3000) / 10000.0)
        out.append(row)
    return out


INIT_CENTROIDS = _init_centroids()


def _d2(x: str, c: str) -> str:
    """Squared L2, index-ordered (Spark SQL)."""
    return (
        f"aggregate(zip_with({x}, {c}, "
        f"(p, q) -> (cast(p AS double) - q) * (cast(p AS double) - q)), "
        f"cast(0 AS double), (a, v) -> a + v)"
    )


def _sql_d2(x: str, c: str) -> str:
    return (
        f"list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, len({x}) + 1), "
        f"i -> ({x}[i]::DOUBLE - {c}[i]) * ({x}[i]::DOUBLE - {c}[i]))), "
        f"(a, v) -> a + v)"
    )


def _init_cents_spark() -> str:
    structs = ", ".join(
        f"named_struct('cid', {k}, 'v', array({', '.join(f'cast({x!r} AS double)' for x in row)}))"
        for k, row in enumerate(INIT_CENTROIDS)
    )
    return f"array({structs})"


def _init_cents_duck() -> str:
    structs = ", ".join(
        f"{{'cid': {k}, 'v': [{', '.join(f'CAST({x!r} AS DOUBLE)' for x in row)}]}}"
        for k, row in enumerate(INIT_CENTROIDS)
    )
    return f"[{structs}]"


#: cluster assignment from a bound `cents` array column:
#: leftmost-min distance -> lowest cid on ties (cents sorted by cid).
_ASSIGN = (
    "transform(array(transform(cents, c -> {d2})), ds -> "
    "cents[array_position(ds, array_min(ds)) - 1].cid)[0]"
)
_MIN_D2 = "array_min(transform(cents, c -> {d2}))"


def _assign(df: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, cluster) via broadcast in-expression argmin."""
    return (
        df.crossJoin(F.broadcast(cents))
        .withColumn(
            "cluster", F.expr(_ASSIGN.format(d2=_d2("embedding", "c.v")))
        )
        .drop("cents")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """1-row (cents) DataFrame of fixed-point-mean centroids, cid-sorted."""
    return (
        assigned.select(
            "cluster", F.posexplode("embedding").alias("dim", "x")
        )
        .withColumn("x_fp", F.floor(F.col("x").cast("double") * KM_FP))
        .groupBy("cluster", "dim")
        .agg(F.sum("x_fp").alias("s"), F.count("*").alias("n"))
        .withColumn("m", F.expr(f"(cast(s AS double) / {KM_FP}) / n"))
        .groupBy("cluster")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)").alias("v")
        )
        .agg(
            F.expr(
                "array_sort(collect_list(struct(cluster AS cid, v)))"
            ).alias("cents")
        )
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM_ITERS unrolled Lloyd iterations from the md5 init; emits
    per final cluster: member count and fixed-point inertia (mean
    squared distance is inertia / n / KM_FP).

    Output: (cluster, n_members, inertia_fp).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = spark.range(1).select(F.expr(_init_cents_spark()).alias("cents"))
    for _ in range(KM_ITERS - 1):
        # localCheckpoint (r11, guide §3.3/§5): each iteration's
        # output is ONE K×DIM row (~4 KB); without the checkpoint the
        # final plan re-evaluates every previous Lloyd pass — and its
        # full corpus scan — once per execution (3 scans at
        # KM_ITERS=3, any of them at 100 TB a full corpus pass).
        # Checkpointed, one execution = one corpus scan; centroid
        # values (fixed-point means) are bit-identical either way.
        cents = _update(_assign(emb, cents)).localCheckpoint()
    final = (
        emb.crossJoin(F.broadcast(cents))
        # one distance vector per row, shared by argmin and min —
        # halves the K×DIM zip_with work vs separate _ASSIGN/_MIN_D2
        # evaluation (same expressions, same values)
        .withColumn("ds", F.expr(f"transform(cents, c -> {_d2('embedding', 'c.v')})"))
        .withColumn(
            "cluster",
            F.expr("cents[array_position(ds, array_min(ds)) - 1].cid"),
        )
        .withColumn("d2", F.expr("array_min(ds)"))
        .withColumn("d2_fp", F.floor(F.col("d2") * KM_FP))
    )
    return final.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum("d2_fp").alias("inertia_fp"),
    )


#: DuckDB argmin/min-distance twins of _ASSIGN/_MIN_D2.
_ASSIGN_DUCK = (
    "list_transform([list_transform(cents, c -> {d2})], ds -> "
    "cents[list_position(ds, list_min(ds))].cid)[1]"
)
_MIN_D2_DUCK = "list_min(list_transform(cents, c -> {d2}))"


def _sql_chain() -> tuple[str, str]:
    """The shared unrolled-Lloyd CTE chain (e + KM_ITERS−1 centroid
    updates), comma-terminated; returns (sql, last_cents_cte) so
    embedding_kmeans and embedding_cluster_purity build their final
    SELECTs on the IDENTICAL iteration text — the two oracles can't
    drift."""
    assign_duck = _ASSIGN_DUCK
    d2 = _sql_d2("embedding", "c.v")
    sql = f"WITH e AS (SELECT vec_id, embedding FROM embeddings),\n"
    sql += f"cents0 AS (SELECT {_init_cents_duck()} AS cents),\n"
    prev = "cents0"
    for it in range(1, KM_ITERS):
        sql += (
            f"a{it} AS (\n"
            f"  SELECT vec_id, embedding, {assign_duck.format(d2=d2)} AS cluster\n"
            f"  FROM e CROSS JOIN {prev}),\n"
            f"s{it} AS (\n"
            f"  SELECT cluster, u.dim AS dim,\n"
            f"         CAST(sum(CAST(floor(u.val::DOUBLE * {KM_FP}) AS BIGINT)) AS BIGINT) AS s,\n"
            f"         count(*) AS n\n"
            f"  FROM (SELECT cluster,\n"
            f"          unnest(list_transform(range(0, len(embedding)),\n"
            f"            i -> {{'dim': i, 'val': embedding[i + 1]}})) AS u\n"
            f"        FROM a{it})\n"
            f"  GROUP BY cluster, u.dim),\n"
            f"v{it} AS (\n"
            f"  SELECT cluster, list((CAST(s AS DOUBLE) / {KM_FP}) / n ORDER BY dim) AS v\n"
            f"  FROM s{it} GROUP BY cluster),\n"
            f"cents{it} AS (\n"
            f"  SELECT list({{'cid': cluster, 'v': v}} ORDER BY cluster) AS cents FROM v{it}),\n"
        )
        prev = f"cents{it}"
    return sql, prev


def _kmeans_sql() -> str:
    assign_duck = _ASSIGN_DUCK
    min_d2_duck = _MIN_D2_DUCK
    d2 = _sql_d2("embedding", "c.v")
    sql, prev = _sql_chain()
    sql += (
        f"final AS (\n"
        f"  SELECT vec_id, {assign_duck.format(d2=d2)} AS cluster,\n"
        f"         CAST(floor({min_d2_duck.format(d2=d2)} * {KM_FP}) AS BIGINT) AS d2_fp\n"
        f"  FROM e CROSS JOIN {prev})\n"
        f"SELECT cluster, count(*) AS n_members, CAST(sum(d2_fp) AS BIGINT) AS inertia_fp\n"
        f"FROM final GROUP BY cluster"
    )
    return sql


EMBEDDING_KMEANS_SQL = _kmeans_sql()


# ---------------------------------------------------------------------------
# Cluster purity vs labels
# ---------------------------------------------------------------------------

def embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-vs-label purity audit: run the SAME unrolled Lloyd
    assignment as embedding_kmeans, then per final cluster report
    its size, majority label, and purity (majority share in basis
    points) — the standard external-validation check that the
    unsupervised geometry agrees with the supervision ("are my
    embedding clusters actually topics"). Low purity on a
    high-inertia cluster is the signal to re-embed before trusting
    embedding-based dedup/curation decisions downstream.

    Majority is deterministic: (count DESC, label ASC) rank-1.
    Purity is one integer DIV. The iteration text is shared with
    embedding_kmeans via _sql_chain, so the two oracles cannot
    drift; shuffles beyond kmeans' own are the (cluster, label)
    partial agg and its |clusters|-row majority window.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cents = spark.range(1).select(F.expr(_init_cents_spark()).alias("cents"))
    for _ in range(KM_ITERS - 1):
        # same per-iteration 1-row centroid checkpoint as
        # embedding_kmeans (see there): one corpus scan per
        # execution instead of one per unrolled Lloyd pass.
        cents = _update(_assign(emb, cents)).localCheckpoint()
    assigned = _assign(emb, cents).select("cluster", "label")
    cl = assigned.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    scored = cl.select(
        "cluster", "label", "n",
        F.expr(
            "row_number() OVER (PARTITION BY cluster "
            "ORDER BY n DESC, label ASC)"
        ).alias("rn"),
        F.expr(
            "CAST(SUM(n) OVER (PARTITION BY cluster) AS BIGINT)"
        ).alias("n_members"),
    )
    return (
        scored.where("rn = 1")
        .withColumn("purity_bp", F.expr("(n * 10000) DIV n_members"))
        .select(
            "cluster", "n_members",
            F.col("label").alias("majority_label"), "purity_bp",
        )
        .orderBy("cluster")
    )


def _purity_sql() -> str:
    d2 = _sql_d2("embedding", "c.v")
    sql, prev = _sql_chain()
    sql += (
        f"fin AS (\n"
        f"  SELECT vec_id, {_ASSIGN_DUCK.format(d2=d2)} AS cluster\n"
        f"  FROM e CROSS JOIN {prev}),\n"
        f"lab AS (SELECT vec_id, label FROM embeddings),\n"
        f"cl AS (\n"
        f"  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n\n"
        f"  FROM fin JOIN lab USING (vec_id) GROUP BY cluster, label),\n"
        f"sc AS (\n"
        f"  SELECT cluster, label, n,\n"
        f"         row_number() OVER (PARTITION BY cluster\n"
        f"           ORDER BY n DESC, label ASC) AS rn,\n"
        f"         CAST(SUM(n) OVER (PARTITION BY cluster) AS BIGINT)\n"
        f"           AS n_members\n"
        f"  FROM cl)\n"
        f"SELECT cluster, n_members, label AS majority_label,\n"
        f"       (n * 10000) // n_members AS purity_bp\n"
        f"FROM sc WHERE rn = 1 ORDER BY cluster"
    )
    return sql


EMBEDDING_CLUSTER_PURITY_SQL = _purity_sql()
