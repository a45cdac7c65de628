"""Persisted IVF index: serving equals the inline computation, and
rebuilds version like any snapshot table."""

from __future__ import annotations

from ensembl_lakehouse_spark import ann_index as AX
from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.operators.similarity import similarity_ivf
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(
        (r.q_id, r.rank, r.vec_id, r.label, round(r.cosine, 12))
        for r in df.collect()
    )


def test_persisted_index_serves_identically(spark, tmp_path):
    tdir = str(tmp_path / "ivf")
    v0 = AX.build_ivf_index(spark, SF_DIR, tdir)
    assert v0 == 0
    served = _rows(AX.query_ivf_index(spark, SF_DIR, tdir))
    inline = _rows(similarity_ivf(spark, SF_DIR))
    assert served == inline
    assert served  # non-empty

    # rebuild is a new version; old one still serves via time travel
    v1 = AX.build_ivf_index(spark, SF_DIR, tdir)
    assert v1 == 1
    assert _rows(AX.query_ivf_index(spark, SF_DIR, tdir, version=v0)) == inline
    assert _rows(AX.query_ivf_index(spark, SF_DIR, tdir)) == inline
    assert [h["op"] for h in SN.history(tdir)] == ["overwrite", "overwrite"]


def test_centroids_are_persisted_in_the_snapshot(spark, tmp_path):
    """The quantizer rides inside the index table: kind='c' rows,
    committed atomically with the members, and the serve path reads
    them from the snapshot (never the live corpus) — so build/serve
    stay consistent even when the corpus drifts after the build."""
    tdir = str(tmp_path / "ivf_c")
    AX.build_ivf_index(spark, SF_DIR, tdir)
    idx = SN.read_snapshot(spark, tdir)
    kinds = {r.kind for r in idx.select("kind").distinct().collect()}
    assert kinds == {"c", "m"}
    cents = AX.persisted_centroids(spark, tdir)
    from ensembl_lakehouse_spark.operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_CENTROID_REM,
    )
    ids = sorted(r.c_id for r in cents.collect())
    assert ids and all(i % IVF_CENTROID_MOD == IVF_CENTROID_REM for i in ids)


def test_incremental_add_equals_full_rebuild(spark, tmp_path):
    """add ≡ rebuild on a split corpus: build on the base partition,
    stamp-add the rest, serve — identical rows to one build over the
    full corpus. The batch deliberately contains no centroid-residue
    ids (a batch that adds centroids is a retrain = rebuild, stated
    in the module docstring)."""
    from ensembl_lakehouse_spark.operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_CENTROID_REM,
        _split,
    )

    _, corpus = _split(spark, SF_DIR)
    residue = (corpus.vec_id % IVF_CENTROID_MOD) == IVF_CENTROID_REM
    batch_pred = (corpus.vec_id % 3 == 0) & ~residue
    base = corpus.where(~batch_pred)
    batch = (
        corpus.where(batch_pred).select("vec_id", "label", "embedding")
    )
    assert batch.count() > 0

    inc_dir = str(tmp_path / "ivf_inc")
    AX._build_from_corpus(base, inc_dir)
    v = AX.add_to_ivf_index(spark, inc_dir, batch, op="ingest-0001")
    # exactly-once: the same stamp is a no-op, version unchanged
    assert AX.add_to_ivf_index(spark, inc_dir, batch, op="ingest-0001") == v

    full_dir = str(tmp_path / "ivf_full")
    AX.build_ivf_index(spark, SF_DIR, full_dir)
    assert _rows(AX.query_ivf_index(spark, SF_DIR, inc_dir)) == _rows(
        AX.query_ivf_index(spark, SF_DIR, full_dir)
    )
    # and the pre-add version still time-travels to base-only results
    assert [h["op"] for h in SN.history(inc_dir)] == ["overwrite", "add:ingest-0001"]


def test_add_stamp_cannot_collide_with_mode_labels(spark, tmp_path):
    """Review regression: a caller stamp equal to a snapshot mode
    label ("overwrite"/"add") must still merge — stamps live in the
    add: namespace, unstamped adds never join the idempotency set."""
    from ensembl_lakehouse_spark.operators.similarity import _split

    _, corpus = _split(spark, SF_DIR)
    tdir = str(tmp_path / "ivf_ns")
    AX._build_from_corpus(corpus.limit(100), tdir)  # history has "overwrite"
    batch = corpus.limit(120).select("vec_id", "label", "embedding")
    v = AX.add_to_ivf_index(spark, tdir, batch, op="overwrite")
    assert v == 1  # merged despite the mode label already in history
    assert "add:overwrite" in SN.committed_ops(tdir)
    # unstamped adds always run (not idempotent, by contract)
    v2 = AX.add_to_ivf_index(spark, tdir, batch)
    assert v2 == 2


def test_legacy_index_without_kind_column_fails_plainly(spark, tmp_path):
    """ADVICE r4 regression: a pre-round-4 index table (no 'kind'
    column) must raise a clear rebuild message, not an unresolved-
    column AnalysisException from deep inside the probe plan."""
    import pytest as _pytest

    from ensembl_lakehouse_spark import ann_index as AI
    from ensembl_lakehouse_spark import snapshots as SN

    legacy = str(tmp_path / "legacy_idx")
    SN.write_snapshot(
        legacy,
        spark.createDataFrame(
            [(1, "a", [0.1, 0.2], 3, 1.0)],
            ["vec_id", "label", "embedding", "cell", "c_nrm"],
        ),
    )
    with _pytest.raises(ValueError, match="legacy IVF index.*rebuild"):
        AI.persisted_centroids(spark, legacy)
    with _pytest.raises(ValueError, match="legacy IVF index"):
        AI.query_ivf_index(spark, "/root/testdata/sf0.001", legacy).collect()
