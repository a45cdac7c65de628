"""Persisted ANN index lifecycle (EXT X2 + X10 composition): build
the IVF index ONCE into a snapshot table, serve similarity queries
against the persisted index — the build/serve separation every
production vector store runs (FAISS trains + adds offline, serves
online; here both halves are Spark plans over the same table).

Why persistence changes the cost model: similarity_ivf recomputes
cell assignment per query batch — fine for one audit, wrong for a
serving path where the corpus assignment is the expensive half
(|corpus| × |centroids| dot products). Building once turns every
subsequent query batch into: assign the QUERIES (tiny) → equi-join
the persisted cell table → exact rerank on candidates. The index is
a snapshots.py table, so it versions like any other data: rebuilds
are atomic commits, a bad rebuild rolls back, incremental corpus
adds are stamped merge commits (the backfill.py pattern), and
readers keep snapshot isolation during rebuilds.

The CENTROIDS are part of the snapshot (``kind='c'`` rows next to
the ``kind='m'`` member rows, one atomic commit covers both), so
query-time probing always uses the exact quantizer the members were
assigned under — even if the source corpus has changed since the
build. Rederiving centroids from the live corpus at query time (the
pre-round-4 shape) silently degraded recall whenever build and
corpus drifted apart; FAISS stores the trained quantizer inside the
index file for exactly this reason.

Consistency pins (tests/test_ann_index.py): serving from the
persisted index returns EXACTLY the rows the inline similarity_ivf
computes on the same corpus; add_to_ivf_index over a split corpus
serves EXACTLY what a full rebuild over the union serves (when the
batch introduces no new centroid-residue vectors — a batch that
does is a retrain, i.e. a rebuild, by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.operators.similarity import (
    IVF_CENTROID_MOD,
    IVF_CENTROID_REM,
    IVF_NPROBE,
    TOP_K,
    _PAIR_COSINE,
    _assign_cells,
    _norm_expr,
    _split,
)


def _centroids_from_corpus(corpus: DataFrame) -> DataFrame:
    return corpus.where(
        (F.col("vec_id") % IVF_CENTROID_MOD) == IVF_CENTROID_REM
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        F.col("c_nrm").alias("cent_nrm"),
    )


def _member_rows(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign ``vectors`` (vec_id, label, embedding, c_nrm) to their
    nearest centroid and shape them as kind='m' index rows."""
    return _assign_cells(
        vectors.select("vec_id", "label", "embedding", "c_nrm"),
        centroids, 1, "embedding", "vec_id", "c_nrm",
    ).select(
        F.lit("m").alias("kind"),
        F.col("c_id").alias("cell"),
        "vec_id", "label", "embedding", "c_nrm",
    )


def _centroid_rows(centroids: DataFrame, label_type: str) -> DataFrame:
    """Centroids as kind='c' rows in the SAME schema (cell = vec_id =
    c_id; label NULL) so one atomic commit persists both halves."""
    return centroids.select(
        F.lit("c").alias("kind"),
        F.col("c_id").alias("cell"),
        F.col("c_id").alias("vec_id"),
        F.lit(None).cast(label_type).alias("label"),
        F.col("c_vec").alias("embedding"),
        F.col("cent_nrm").alias("c_nrm"),
    )


def _build_from_corpus(corpus: DataFrame, table_dir: str) -> int:
    centroids = _centroids_from_corpus(corpus)
    label_type = dict(corpus.dtypes)["label"]
    rows = _member_rows(corpus, centroids).unionByName(
        _centroid_rows(centroids, label_type)
    )
    return SN.write_snapshot(table_dir, rows, mode="overwrite")


def build_ivf_index(spark: SparkSession, sf_dir: str, table_dir: str) -> int:
    """Assign every corpus vector to its cell and commit members +
    centroids as one atomic snapshot; returns the committed version.
    Rebuild (= retrain) is calling this again: new snapshot, readers
    of the old version undisturbed."""
    _, corpus = _split(spark, sf_dir)
    return _build_from_corpus(corpus, table_dir)


def _require_kind_schema(idx: DataFrame, table_dir: str, version) -> None:
    """Fail fast with a plain message on pre-round-4 index layouts.

    Indexes committed before centroids were persisted (no ``kind``
    column) — including time-travel reads of pre-migration versions
    of a since-rebuilt index — would otherwise surface as an opaque
    unresolved-column AnalysisException deep inside the probe plan."""
    if "kind" not in idx.columns:
        at = f" at version {version}" if version is not None else ""
        raise ValueError(
            f"legacy IVF index layout in {table_dir}{at}: no 'kind' "
            "column (pre-centroid-persistence format) — run "
            "build_ivf_index to rebuild it; historical pre-migration "
            "versions cannot be served"
        )


def persisted_centroids(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The quantizer stored inside the index snapshot — the ONLY
    centroid source the serve and add paths use."""
    idx = SN.read_snapshot(spark, table_dir, version=version)
    _require_kind_schema(idx, table_dir, version)
    return idx.where(F.col("kind") == "c").select(
        F.col("cell").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        F.col("c_nrm").alias("cent_nrm"),
    )


def add_to_ivf_index(
    spark: SparkSession,
    table_dir: str,
    batch: DataFrame,
    op: str | None = None,
) -> int:
    """Incrementally add ``batch`` (vec_id, label, embedding) to the
    index: assign against the PERSISTED centroids and merge-commit
    the new member rows — cost ∝ |batch| × |centroids|, never a
    corpus rescan (the affordable growing-corpus shape, same as
    dedup_incremental).

    ``op`` is the exactly-once stamp (backfill.py protocol): pass a
    stable id per ingest batch and a crashed/retried add becomes a
    no-op instead of a duplicate merge. Caller stamps are recorded
    under the ``add:`` namespace (the backfill:/batch: convention),
    so a stamp that happens to equal a snapshot mode label
    ("overwrite", "merge", "compact", or a previous unstamped "add")
    can never collide with history and silently drop the batch.
    Unstamped adds record a plain mode label and never participate
    in the idempotency check. Merge key is (kind, vec_id), so
    re-adding an existing vector REPLACES its row (upsert) and
    centroid rows are never touched."""
    stamp = f"add:{op}" if op is not None else None
    if stamp is not None and stamp in SN.committed_ops(table_dir):
        return SN.current_version(table_dir)
    centroids = persisted_centroids(spark, table_dir)
    batch_n = batch.withColumn("c_nrm", F.expr(_norm_expr("embedding")))
    rows = _member_rows(batch_n, centroids)
    return SN.merge_snapshot(
        spark, table_dir, rows, key=["kind", "vec_id"], op=stamp or "add"
    )


def query_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    table_dir: str,
    version: int | None = None,
) -> DataFrame:
    """Serve the standard query batch against the persisted index
    (optionally time-traveling to an older index version): probe
    IVF_NPROBE cells per query using the SNAPSHOT's centroids,
    exact-cosine rerank over the probed members, top-K."""
    queries, _ = _split(spark, sf_dir)
    idx = SN.read_snapshot(spark, table_dir, version=version)
    _require_kind_schema(idx, table_dir, version)
    centroids = idx.where(F.col("kind") == "c").select(
        F.col("cell").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        F.col("c_nrm").alias("cent_nrm"),
    )
    members = idx.where(F.col("kind") == "m")
    probes = _assign_cells(
        queries, centroids, IVF_NPROBE, "q_vec", "q_id", "q_nrm"
    ).select("q_id", "q_vec", "q_nrm", F.col("c_id").alias("cell"))
    cand = members.join(F.broadcast(probes), "cell").select(
        "q_id", "q_vec", "q_nrm", "vec_id", "label", "embedding", "c_nrm"
    )
    return (
        cand.withColumn("cosine", F.expr(_PAIR_COSINE))
        .withColumn(
            "rank",
            F.expr(
                "row_number() OVER (PARTITION BY q_id "
                "ORDER BY cosine DESC, vec_id ASC)"
            ),
        )
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "rank", "vec_id", "label", "cosine")
    )
