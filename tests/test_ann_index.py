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
