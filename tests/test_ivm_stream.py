"""Streaming medallion chain (stream → source snapshot table → N
maintained rollups): final rollups equal a batch recompute, restarts
ingest nothing twice, and a redelivered batch is a provable no-op
at every link of the chain."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark import ivm
from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.streaming import ivm_stream as IS
from ensembl_lakehouse_spark.streaming.events import load_events_batch
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """Events split into 3 files so maxFilesPerTrigger=1 yields a
    genuinely multi-batch run."""
    d = tmp_path_factory.mktemp("ivm_stream_src")
    load_events_batch(spark, f"{SF_DIR}/events.parquet").repartition(
        3
    ).write.mode("overwrite").parquet(str(d / "files"))
    return str(d / "files")


def _recompute(spark, events_dir, group_cols):
    return {
        tuple(r[c] for c in group_cols): (r.n, r.s)
        for r in load_events_batch(spark, events_dir)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("bigint")).alias("s"),
        )
        .collect()
    }


def _view(spark, rollup_dir, group_cols):
    return {
        tuple(r[c] for c in group_cols): (r.n_rows, r.sum_val)
        for r in ivm.read_rollup(spark, rollup_dir).collect()
    }


def test_stream_ivm_chain_matches_batch_and_survives_restart(
    spark, split_events_dir, tmp_path_factory
):
    base = tmp_path_factory.mktemp("ivm_stream")
    src = str(base / "source")
    by_type = IS.RollupDef(str(base / "by_type"), ("event_type",), "value")
    by_user = IS.RollupDef(str(base / "by_user"), ("user_id",), "value")
    ckpt = str(base / "ckpt")

    out = IS.run_stream_ivm(
        spark, split_events_dir, src, [by_type, by_user],
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert out["n_batches"] == 3
    n_events = load_events_batch(spark, split_events_dir).count()
    assert out["n_input_rows"] == n_events

    # source table holds exactly the stream (keyed dedup on event_id)
    assert SN.read_snapshot(spark, src).count() == n_events
    # every rollup equals the from-scratch batch aggregate
    for rd in (by_type, by_user):
        assert _view(spark, rd.rollup_dir, list(rd.group_cols)) == _recompute(
            spark, split_events_dir, list(rd.group_cols)
        )
    # first batch aggregates fully, later ones apply deltas
    modes = [t[by_type.rollup_dir] for t in out["ticks"]]
    assert modes[0] == "full" and set(modes[1:]) == {"delta"}

    # restart on the same checkpoint: nothing re-ingested, state kept
    v = SN.current_version(src)
    out2 = IS.run_stream_ivm(
        spark, split_events_dir, src, [by_type, by_user],
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert out2["n_batches"] == 0
    assert SN.current_version(src) == v

    # a NEW file after restart flows through incrementally
    extra_dir = tmp_path_factory.mktemp("ivm_extra")
    extra = load_events_batch(spark, split_events_dir).limit(0)
    spark.createDataFrame(
        [(10_000_001, None, 7, "purchase", 42.0, "{}")], extra.schema
    ).write.mode("overwrite").parquet(str(extra_dir / "f"))
    shutil.copy(
        next(
            str(p)
            for p in __import__("pathlib").Path(extra_dir / "f").glob("*.parquet")
        ),
        split_events_dir + "/late.parquet",
    )
    out3 = IS.run_stream_ivm(
        spark, split_events_dir, src, [by_type, by_user],
        max_files_per_trigger=1, checkpoint_dir=ckpt,
    )
    assert out3["n_batches"] == 1
    assert [t[by_type.rollup_dir] for t in out3["ticks"]] == ["delta"]
    assert _view(spark, by_type.rollup_dir, ["event_type"]) == _recompute(
        spark, split_events_dir, ["event_type"]
    )


def test_redelivered_batch_is_noop_end_to_end(
    spark, split_events_dir, tmp_path_factory
):
    base = tmp_path_factory.mktemp("ivm_replay")
    src = str(base / "source")
    rd = IS.RollupDef(str(base / "by_type"), ("event_type",), "value")

    out = IS.run_stream_ivm(spark, split_events_dir, src, [rd])
    assert out["n_batches"] == 1
    before = _view(spark, rd.rollup_dir, ["event_type"])

    # redeliver batch 0 in full (crash between commit and checkpoint)
    replay = IS.replay_batch(
        spark, src, load_events_batch(spark, split_events_dir), 0, [rd]
    )
    assert replay["merged"] is False  # ingest stamp absorbed it
    assert replay["modes"] == ["noop"]  # maintain saw no new version
    assert replay["version_after"] == replay["version_before"]
    assert _view(spark, rd.rollup_dir, ["event_type"]) == before


def test_stream_chain_advances_hierarchical_children(
    spark, split_events_dir, tmp_path_factory
):
    """r7: the medallion chain ticks hierarchical children AFTER
    their parents per batch, so one availableNow run brings the
    whole lattice (source → by_type_day → by_type) to the final
    source commit; a replayed batch noops at every level."""
    from pyspark.sql import functions as F

    from ensembl_lakehouse_spark.streaming.events import load_events_batch

    base = tmp_path_factory.mktemp("ivm_stream_hier")
    src = str(base / "source")
    parent = IS.RollupDef(
        str(base / "by_type_day"), ("event_type", "day"), "value"
    )
    child = IS.ChildRollupDef(
        parent.rollup_dir,
        str(base / "by_type"),
        {"event_type": "event_type"},
    )
    ckpt = str(base / "ckpt")

    # the parent groups on a derived day column: materialize it into
    # the source by streaming into a source table keyed on event_id
    # whose reader exposes day — simplest: group on event_type only
    # at the parent too, child collapses to a global per-type view.
    parent = IS.RollupDef(str(base / "by_type_day"), ("event_type",), "value")
    child = IS.ChildRollupDef(
        parent.rollup_dir, str(base / "by_type"), {"event_type": "event_type"}
    )

    out = IS.run_stream_ivm(
        spark, split_events_dir, src, [parent],
        max_files_per_trigger=1, checkpoint_dir=ckpt,
        children=[child],
    )
    # ≥3: the shared fixture dir may have grown an extra file from
    # the restart test that runs before this one (module scope)
    assert out["n_batches"] >= 3
    child_modes = [t[child.child_dir] for t in out["ticks"]]
    assert child_modes[0] == "full" and set(child_modes[1:]) == {"delta"}

    truth = {
        r.event_type: (r.n, r.s)
        for r in load_events_batch(spark, split_events_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("bigint")).alias("s"),
        )
        .collect()
    }
    got = {
        r.event_type: (r.n_rows, r.sum_val)
        for r in ivm.read_rollup(spark, child.child_dir).collect()
    }
    assert got == truth

    # replayed batch: no-op at ingest, parent AND child levels
    batch = load_events_batch(spark, split_events_dir).limit(5)
    rep = IS.replay_batch(
        spark, src, batch, 0, [parent], children=[child]
    )
    assert rep["merged"] is False
    assert rep["modes"] == ["noop", "noop"]
    assert rep["version_before"] == rep["version_after"]


def test_misordered_children_are_topologically_sorted(
    spark, tmp_path_factory
):
    """r7 ADVICE (ivm_stream.py:123): a grandchild declared BEFORE
    its parent child must still tick after it — otherwise every
    downstream hop ends the run one micro-batch stale with no
    error. The chain here is source → by_type (rollup) → mid
    (child) → leaf (grandchild), declared [leaf, mid]."""
    base = tmp_path_factory.mktemp("ivm_stream_topo")
    # private events dir: 3 files → 3 batches; a stale leaf would
    # miss batch 3's rows entirely
    load_events_batch(spark, f"{SF_DIR}/events.parquet").limit(
        300
    ).repartition(3).write.mode("overwrite").parquet(str(base / "files"))
    events_dir = str(base / "files")
    src = str(base / "source")
    parent = IS.RollupDef(str(base / "by_type"), ("event_type",), "value")
    mid = IS.ChildRollupDef(
        parent.rollup_dir, str(base / "mid"), {"event_type": "event_type"}
    )
    leaf = IS.ChildRollupDef(
        mid.child_dir, str(base / "leaf"), {"event_type": "event_type"}
    )
    out = IS.run_stream_ivm(
        spark, events_dir, src, [parent],
        max_files_per_trigger=1, checkpoint_dir=str(base / "ckpt"),
        children=[leaf, mid],  # MIS-ORDERED on purpose
    )
    assert out["n_batches"] == 3
    truth = {
        r.event_type: (r.n, r.s)
        for r in load_events_batch(spark, events_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("bigint")).alias("s"),
        )
        .collect()
    }
    for d in (mid.child_dir, leaf.child_dir):
        got = {
            r.event_type: (r.n_rows, r.sum_val)
            for r in ivm.read_rollup(spark, d).collect()
        }
        assert got == truth, d


def test_child_cycle_is_refused(tmp_path):
    a = IS.ChildRollupDef(str(tmp_path / "y"), str(tmp_path / "x"), {"k": "k"})
    b = IS.ChildRollupDef(str(tmp_path / "x"), str(tmp_path / "y"), {"k": "k"})
    with pytest.raises(ValueError, match="cycle"):
        IS._topo_children([a, b])
    # duplicate child dirs are a configuration error too
    with pytest.raises(ValueError, match="duplicate"):
        IS._topo_children([a, a])


def test_stream_chain_ticks_aux_rollups(spark, tmp_path_factory):
    """r8: AuxRollupDefs tick per micro-batch like the sum rollups —
    by run end the streaming-maintained MIN/MAX view equals a batch
    recompute, and a replayed batch noops at the aux level too."""
    base = tmp_path_factory.mktemp("ivm_stream_aux")
    load_events_batch(spark, f"{SF_DIR}/events.parquet").limit(
        300
    ).repartition(3).write.mode("overwrite").parquet(str(base / "files"))
    events_dir = str(base / "files")
    src = str(base / "source")
    sum_r = IS.RollupDef(str(base / "by_type"), ("event_type",), "value")
    aux_r = IS.AuxRollupDef(
        str(base / "mm_type"), ("event_type",), "value", kind="minmax"
    )
    out = IS.run_stream_ivm(
        spark, events_dir, src, [sum_r],
        max_files_per_trigger=1, checkpoint_dir=str(base / "ckpt"),
        aux=[aux_r],
    )
    assert out["n_batches"] == 3
    modes = [t[aux_r.rollup_dir] for t in out["ticks"]]
    assert modes[0] == "full" and set(modes[1:]) == {"delta"}
    truth = {
        r.event_type: (r.n, r.lo, r.hi)
        for r in load_events_batch(spark, events_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    got = {
        r.event_type: (r.n_rows, r.min_val, r.max_val)
        for r in ivm.read_aux_rollup(spark, aux_r.rollup_dir).collect()
    }
    assert got == truth
    # replayed batch: no-op at ingest, sum AND aux levels
    batch = load_events_batch(spark, events_dir).limit(5)
    rep = IS.replay_batch(spark, src, batch, 0, [sum_r], aux=[aux_r])
    assert rep["merged"] is False
    assert rep["modes"] == ["noop", "noop"]


def test_stream_chain_ticks_quantile_rollups(spark, tmp_path_factory):
    """r10: the DDSketch quantile kind rides the same AuxRollupDef
    seam — by run end the streaming-maintained sketch BIT-equals a
    batch recompute (bucket adds are associative across micro-batch
    deltas), the percentile estimate tracks the exact median within
    the documented bound, and a replayed batch noops."""
    import math as _m

    base = tmp_path_factory.mktemp("ivm_stream_q")
    load_events_batch(spark, f"{SF_DIR}/events.parquet").limit(
        300
    ).repartition(3).write.mode("overwrite").parquet(str(base / "files"))
    events_dir = str(base / "files")
    src = str(base / "source")
    sum_r = IS.RollupDef(str(base / "by_type"), ("event_type",), "value")
    q_r = IS.AuxRollupDef(
        str(base / "q_type"), ("event_type",), "value", kind="quantile"
    )
    out = IS.run_stream_ivm(
        spark, events_dir, src, [sum_r],
        max_files_per_trigger=1, checkpoint_dir=str(base / "ckpt"),
        aux=[q_r],
    )
    assert out["n_batches"] == 3
    modes = [t[q_r.rollup_dir] for t in out["ticks"]]
    assert modes[0] == "full" and set(modes[1:]) == {"delta"}
    scratch = str(base / "scratch")
    ivm.maintain_aux_rollup(
        spark, src, scratch, ["event_type"], "value", kind="quantile"
    )
    def _state(d):
        return {
            r.event_type: (r.n_rows, tuple((e.k, e.v) for e in r.qsk))
            for r in ivm.read_aux_rollup(spark, d).collect()
        }
    assert _state(q_r.rollup_dir) == _state(scratch)
    # the served estimate tracks the exact median within α
    est = {
        r.event_type: r.p50
        for r in ivm.read_aux_rollup(spark, q_r.rollup_dir)
        .withColumn("_r", ivm.q_rank_expr("qsk", 0.5))
        .withColumn("_k", ivm.q_key_expr("qsk", "_r"))
        .withColumn("p50", ivm.q_value_expr("_k"))
        .collect()
    }
    vals = {}
    for r in load_events_batch(spark, events_dir).select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r.event_type, []).append(r.value)
    alpha = (ivm.Q_GAMMA - 1) / (ivm.Q_GAMMA + 1)
    for t, s in vals.items():
        s = sorted(v for v in s if v is not None)
        true = s[max(1, _m.ceil(0.5 * len(s))) - 1]
        assert abs(est[t] - true) <= alpha * abs(true) + 1e-9
    # replayed batch: no-op at ingest, sum AND quantile levels
    batch = load_events_batch(spark, events_dir).limit(5)
    rep = IS.replay_batch(spark, src, batch, 0, [sum_r], aux=[q_r])
    assert rep["merged"] is False
    assert rep["modes"] == ["noop", "noop"]
