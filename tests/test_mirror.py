"""CDC mirror: the downstream replica advanced purely from
snapshot_diff feeds — pinned equal to the source after every sync,
exactly-once under replay, incremental in the files it plans."""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark import mirror as MI
from ensembl_lakehouse_spark import snapshots as SN


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "dst")


def _rows(spark, d, **kw):
    return sorted(map(tuple, SN.read_snapshot(spark, d, **kw).collect()))


def test_mirror_tracks_source_through_merge_and_delete(spark, dirs):
    src, dst = dirs
    SN.write_snapshot(
        src, spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["k", "v"])
    )
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["action"] == "seed"
    assert _rows(spark, dst) == _rows(spark, src)

    # source: upsert + insert
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(3, "V3"), (42, "new")], ["k", "v"]),
        key="k",
    )
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out == {
        "from": 0, "to": 1, "action": "delta", "upserts": 2, "deletes": 0,
    }
    assert _rows(spark, dst) == _rows(spark, src)

    # source: delete + another upsert, mirrored in one sync
    SN.delete_snapshot(spark, src, where="k IN (1, 2)")
    SN.merge_snapshot(
        spark, src, spark.createDataFrame([(5, "V5")], ["k", "v"]), key="k"
    )
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["action"] == "delta" and out["deletes"] == 2
    assert _rows(spark, dst) == _rows(spark, src)

    # replay: the stamp makes the same sync a no-op
    v = SN.current_version(dst)
    assert MI.mirror_snapshot(spark, src, dst, key="k")["action"] == "noop"
    assert SN.current_version(dst) == v
    assert MI.last_mirrored_version(dst) == SN.current_version(src)


def test_mirror_delete_only_sync_advances_marker(spark, dirs):
    src, dst = dirs
    SN.write_snapshot(
        src, spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    )
    MI.mirror_snapshot(spark, src, dst, key="k")
    SN.delete_snapshot(spark, src, where="k = 1")
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["deletes"] == 1 and out["upserts"] == 0
    assert _rows(spark, dst) == _rows(spark, src) == [(2, "b")]
    # marker advanced despite zero upserts
    assert MI.last_mirrored_version(dst) == SN.current_version(src)
    assert MI.mirror_snapshot(spark, src, dst, key="k")["action"] == "noop"


def test_mirror_refuses_rolled_back_source(spark, dirs):
    src, dst = dirs
    SN.write_snapshot(src, spark.createDataFrame([(1, "a")], ["k", "v"]))
    SN.merge_snapshot(
        spark, src, spark.createDataFrame([(2, "b")], ["k", "v"]), key="k"
    )
    MI.mirror_snapshot(spark, src, dst, key="k")
    SN.rollback(src, 0)  # moves src to v2 (content of v0)
    # rollback CREATES a new version, so the mirror follows it fine
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["action"] == "delta"
    assert _rows(spark, dst) == _rows(spark, src) == [(1, "a")]


def test_mirror_resumes_dangling_half_sync_before_advancing(spark, dirs):
    """r7 ADVICE (mirror.py:102): a crash between the delete commit
    (mirror-del:vN stamped) and the upsert commit (mirror:vN never
    lands) must be completed AT vN before syncing to a newer source
    version — else a key deleted by vN and re-inserted by a later
    commit with its original values diffs 'unchanged' over the
    straight last→current jump and is silently lost forever."""
    from pyspark.sql import functions as F

    src, dst = dirs
    SN.write_snapshot(
        src, spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    )
    MI.mirror_snapshot(spark, src, dst, key="k")  # seed, mirror:v0

    SN.delete_snapshot(spark, src, where="k = 1")  # source v1
    # simulate the crashed sync: the delete half applied and stamped,
    # the final mirror:v1 stamp never landed
    diff = SN.snapshot_diff(spark, src, 0, 1, key=["k"])
    dels = diff.where(F.col("_change") == "delete").select("k")
    SN.delete_snapshot(
        spark, dst, keys=dels, key=["k"], op="mirror-del:v1"
    )
    assert MI.last_mirrored_version(dst) == 0  # still points at v0

    # source advances: k=1 re-inserted with its ORIGINAL value — the
    # v0→v2 diff sees it as unchanged, so only a resume-at-v1 sync
    # (where v1→v2 shows it as an insert) can restore it
    SN.merge_snapshot(
        spark, src, spark.createDataFrame([(1, "a")], ["k", "v"]), key="k"
    )  # source v2

    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["action"] == "delta" and out["resumed"] == [1]
    assert _rows(spark, dst) == _rows(spark, src) == [(1, "a"), (2, "b")]
    assert MI.last_mirrored_version(dst) == 2
    # and the completed sync is stable: replay is a no-op
    assert MI.mirror_snapshot(spark, src, dst, key="k")["action"] == "noop"


def test_mirror_dangling_half_sync_at_current_version(spark, dirs):
    """Crash with source still AT the half-synced version: the normal
    delta path completes it (del stamp skips the replay) — no resume
    hop needed, deletes applied exactly once."""
    from pyspark.sql import functions as F

    src, dst = dirs
    SN.write_snapshot(
        src, spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    )
    MI.mirror_snapshot(spark, src, dst, key="k")
    SN.delete_snapshot(spark, src, where="k = 1")  # source v1
    diff = SN.snapshot_diff(spark, src, 0, 1, key=["k"])
    dels = diff.where(F.col("_change") == "delete").select("k")
    SN.delete_snapshot(
        spark, dst, keys=dels, key=["k"], op="mirror-del:v1"
    )
    out = MI.mirror_snapshot(spark, src, dst, key="k")
    assert out["action"] == "delta" and "resumed" not in out
    assert _rows(spark, dst) == _rows(spark, src) == [(2, "b")]
    assert MI.last_mirrored_version(dst) == 1


def test_mirror_is_file_scoped_on_clustered_destination(spark, dirs):
    """With scope_by, a small source change rewrites O(matching
    files) on the DESTINATION too — the replica pays for the change,
    not its own size."""
    src, dst = dirs
    df = spark.range(0, 800).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    SN.write_snapshot(src, df, cluster_by=["k"], n_files=8)
    MI.mirror_snapshot(spark, src, dst, key="k")
    SN.compact(spark, dst, target_files=8, cluster_by=["k"])
    before = SN._read_manifest(dst, SN.current_version(dst))

    SN.merge_snapshot(
        spark, src, spark.createDataFrame([(5, "FIVE")], ["k", "v"]),
        key="k", scope_by="k",
    )
    out = MI.mirror_snapshot(spark, src, dst, key="k", scope_by="k")
    assert out["upserts"] == 1
    after = SN._read_manifest(dst, SN.current_version(dst))
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) >= 6, carried
    assert _rows(spark, dst) == _rows(spark, src)
