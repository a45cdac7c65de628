"""Tests for the X4 multimodal operators, focused on what the
DuckDB oracle can't check: the mapInPandas decode stage (schema,
Arrow batch shape, determinism, pluggable decoder) and the
fixed-point determinism rationale of the centroid aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators import multimodal as M
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def payloads(spark):
    return M.documents_with_payload(spark, SF_DIR)


def test_decode_schema_and_coverage(spark, payloads):
    out = M.decode_payloads(payloads)
    assert out.schema == M.DECODE_SCHEMA
    rows = out.collect()
    src = payloads.count()
    assert len(rows) == src  # one output row per payload, no drops
    for r in rows[:20]:
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert len(r.features) == M.N_FEATURES
        assert all(0.0 <= f <= 1.0 for f in r.features)


def test_decode_is_deterministic(spark, payloads):
    a = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in M.decode_payloads(payloads).collect()}
    b = {r.doc_id: (r.width, r.height, tuple(r.features)) for r in M.decode_payloads(payloads).collect()}
    assert a == b


def test_decode_n_bytes_matches_jvm_side(spark, payloads):
    """The Python-side len(payload) must agree with the JVM-side
    octet_length — i.e. the Arrow transfer hands the UDF the exact
    bytes the engine sees."""
    jvm = {r.doc_id: r.n for r in payloads.select("doc_id", F.octet_length("payload").alias("n")).collect()}
    py = {r.doc_id: r.n_bytes for r in M.decode_payloads(payloads).collect()}
    assert jvm == py


def test_decode_custom_fn_and_failure_path(spark, payloads):
    """decode_fn is pluggable; a decoder raising NotImplementedError
    (the documented gate for absent media libs) surfaces as a task
    failure, not silent nulls."""
    def constant_fn(payload: bytes):
        return 2, 3, [0.5] * M.N_FEATURES

    rows = M.decode_payloads(payloads.limit(5), decode_fn=constant_fn).collect()
    assert all((r.width, r.height) == (2, 3) for r in rows)

    def gated_fn(payload: bytes):
        raise NotImplementedError("media codec not installed")

    with pytest.raises(Exception, match="NotImplementedError|media codec"):
        M.decode_payloads(payloads.limit(1), decode_fn=gated_fn).collect()


def test_centroid_fixed_point_is_partition_order_invariant(spark):
    """The documented reason for fixed-point sums: result must be
    identical under different partitionings (parallel double sums
    are not). Repartition shuffles row order; results must match
    exactly, not approximately."""
    base = M.multimodal_centroid(spark, SF_DIR)
    emb = M.load_table(spark, SF_DIR, "embeddings").repartition(17)
    emb.createOrReplaceTempView("_emb_reordered")

    exploded = emb.select("label", F.posexplode("embedding").alias("dim", "x")).withColumn(
        "x_fp", F.floor(F.col("x").cast("double") * M.FP_SCALE)
    )
    alt = (
        exploded.groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("x_fp").alias("sum_fp"),
            F.min(F.col("x").cast("double")).alias("dim_min"),
            F.max(F.col("x").cast("double")).alias("dim_max"),
        )
        .select(
            "label",
            "dim",
            "n",
            ((F.col("sum_fp").cast("double") / M.FP_SCALE) / F.col("n")).alias("dim_mean"),
            "dim_min",
            "dim_max",
        )
    )
    key = lambda rows: sorted((r.label, r.dim, r.n, r.dim_mean, r.dim_min, r.dim_max) for r in rows)
    assert key(base.collect()) == key(alt.collect())


def test_resize_stage_shapes_and_determinism(spark):
    src = M.documents_with_payload(spark, SF_DIR)
    out = M.resize_payloads(src, target=(16, 9)).collect()
    assert len(out) == src.count()  # 1→1
    assert all(r.width == 16 and r.height == 9 for r in out)
    assert all(1 <= r.src_width <= 64 and 1 <= r.src_height <= 64 for r in out)
    again = {r.doc_id: r.resized_fp for r in M.resize_payloads(src, target=(16, 9)).collect()}
    assert {r.doc_id: r.resized_fp for r in out} == again
    # target participates in the fingerprint: a different size is a
    # different artifact, never a silent cache hit
    other = {r.doc_id: r.resized_fp for r in M.resize_payloads(src, target=(32, 32)).collect()}
    assert all(other[i] != fp for i, fp in again.items())


def test_frame_sampling_expands_one_to_n(spark):
    src = M.documents_with_payload(spark, SF_DIR)
    n_docs = src.count()
    out = M.sample_frames(src).collect()
    assert len(out) > n_docs  # genuinely 1→N
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == n_docs
    for doc_id, rows in by_doc.items():
        idxs = [r.frame_idx for r in rows]
        total = rows[0].total_frames
        assert len(rows) <= M.N_SAMPLED_FRAMES
        assert idxs == sorted(set(idxs))  # strictly increasing, no dup frames
        assert all(0 <= i < total for i in idxs)
        assert len({r.frame_fp for r in rows}) == len(rows)
