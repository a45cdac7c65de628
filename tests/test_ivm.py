"""Incremental view maintenance: rollup maintained from CDC deltas
equals a full recompute at every source version; maintenance is
exactly-once and delta-driven after the first run."""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_lakehouse_spark import ivm
from ensembl_lakehouse_spark import snapshots as SN


def _recompute(spark, src):
    return {
        (r.grp,): (r.n_rows, r.sum_val)
        for r in SN.read_snapshot(spark, src)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").cast("bigint")).alias("sum_val"),
        )
        .collect()
    }


def _view(spark, rollup):
    return {
        (r.grp,): (r.n_rows, r.sum_val)
        for r in ivm.read_rollup(spark, rollup).collect()
    }


def test_rollup_tracks_source_through_inserts_updates_deletes(spark, tmp_path):
    src = str(tmp_path / "src")
    rol = str(tmp_path / "rollup")
    rows = [(i, f"g{i % 3}", i) for i in range(30)]
    SN.write_snapshot(src, spark.createDataFrame(rows, ["k", "grp", "val"]))

    out = ivm.maintain_rollup(spark, src, rol, ["grp"], "val")
    assert out["mode"] == "full"
    assert _view(spark, rol) == _recompute(spark, src)

    # v1: updates (k 0-4 change value AND group) + inserts (k 100-104)
    upd = [(k, "g9", k * 10) for k in range(5)] + [
        (k, "g9", k) for k in range(100, 105)
    ]
    SN.merge_snapshot(
        spark, src, spark.createDataFrame(upd, ["k", "grp", "val"]), key="k"
    )
    out = ivm.maintain_rollup(spark, src, rol, ["grp"], "val")
    assert out["mode"] == "delta"
    assert _view(spark, rol) == _recompute(spark, src)

    # exactly-once: same source version -> noop, state unchanged
    assert ivm.maintain_rollup(spark, src, rol, ["grp"], "val")["mode"] == "noop"
    assert _view(spark, rol) == _recompute(spark, src)

    # v2: "delete" an entire group by overwriting without it
    kept = (
        SN.read_snapshot(spark, src).where("grp <> 'g9'")
    )
    SN.write_snapshot(src, kept, mode="overwrite")
    out = ivm.maintain_rollup(spark, src, rol, ["grp"], "val")
    assert out["mode"] == "delta"
    assert _view(spark, rol) == _recompute(spark, src)
    # the emptied group survives only as a filtered tombstone
    raw = {r.grp: r.n_rows for r in SN.read_snapshot(spark, rol).collect()}
    assert raw.get("g9") == 0

    # several source commits between maintenance ticks fold into ONE delta
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(200, "g0", 7)], ["k", "grp", "val"]), key="k",
    )
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(201, "g1", 8)], ["k", "grp", "val"]), key="k",
    )
    out = ivm.maintain_rollup(spark, src, rol, ["grp"], "val")
    assert out["mode"] == "delta"
    assert _view(spark, rol) == _recompute(spark, src)
