"""Failure-injection matrix for the hierarchical rollup chain
(r7 VERDICT #4): kill the maintenance sequence in each window —
between ingest stamp and first tick, between parent tick and child
tick, and rollback-the-parent-after-child-tick — then assert the
chain freshness REPORTS the inconsistency (strict never serves it)
and that the documented resume converges to the base recompute.
Mirrors the crash discipline test_mirror.py pins for the mirror.

A "crash" here is simply stopping mid-sequence: every step is an
independent process-safe commit, so resuming IS re-running the
remaining steps (idempotent via the ivm:src_v stamps)."""

from __future__ import annotations

from ensembl_lakehouse_spark import ivm
from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.plans import rewrite as RW


def _chain(spark, tmp_path):
    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    by_t = str(tmp_path / "by_t")
    rows = [(i, i % 14, f"t{i % 3}", i) for i in range(60)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "day", "t", "v"])
    )
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    ivm.maintain_rollup_from_rollup(spark, daily, by_t, {"t": "t"})
    cat = RW.RollupCatalog()
    cat.register("daily", daily, src, ["day", "t"], "v")
    cat.register("by_t", by_t, src, ["t"], "v", parent_dir=daily)
    return src, daily, by_t, cat


AGGS = {"n": ("count", ""), "total": ("sum", "v")}


def _truth(spark, src):
    want, why = RW.answer_aggregate(
        spark, RW.RollupCatalog(), src, ["t"], AGGS
    )
    assert why["used"] == "base"
    return sorted(map(tuple, want.collect()))


def _merge(spark, src, rows, op=None):
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame(rows, ["k", "day", "t", "v"]),
        key="k", op=op,
    )


def test_crash_between_ingest_stamp_and_first_tick(spark, tmp_path):
    """Window (b): the source commit (with its exactly-once stamp)
    lands, then the process dies before ANY tick. Both hops report
    stale; a redelivered batch is a no-op at the source; the resumed
    tick sequence converges."""
    src, daily, by_t, cat = _chain(spark, tmp_path)
    _merge(spark, src, [(900, 1, "t0", 50)], op="ingest:batch7")
    v_after = SN.current_version(src)
    # CRASH here: no ticks ran. Strict serving falls back entirely.
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert why["used"] == "base"
    reasons = {s["rollup"]: s["reason"] for s in why["skipped"]}
    assert reasons["daily"].startswith("stale")
    assert reasons["by_t"].startswith("stale")
    # resume = redeliver the batch (exactly-once guard), then run
    # the tick sequence
    if "ingest:batch7" not in SN.committed_ops(src):
        _merge(spark, src, [(900, 1, "t0", 50)], op="ingest:batch7")
    assert SN.current_version(src) == v_after  # replay was a no-op
    assert ivm.maintain_rollup(
        spark, src, daily, ["day", "t"], "v"
    )["mode"] == "delta"
    assert ivm.maintain_rollup_from_rollup(
        spark, daily, by_t, {"t": "t"}
    )["mode"] == "delta"
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert why["used"] == "rollup" and why["rollup"] == "by_t"
    assert sorted(map(tuple, got.collect())) == _truth(spark, src)


def test_crash_between_parent_tick_and_child_tick(spark, tmp_path):
    """Window (a): the parent applied the base commit, the child did
    not. The child must report stale (strict falls back to the fresh
    parent), stale_ok must serve the child's PRE-commit state — a
    consistent earlier version, never a mix — and the resumed child
    tick converges."""
    src, daily, by_t, cat = _chain(spark, tmp_path)
    pre = {
        r["t"]: (r["n"], r["total"])
        for r in RW.answer_aggregate(
            spark, RW.RollupCatalog(), src, ["t"], AGGS
        )[0].collect()
    }
    _merge(spark, src, [(900, 1, "t0", 50)], op=None)
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    # CRASH before the child tick. Strict: fresh parent answers.
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert why["used"] == "rollup" and why["rollup"] == "daily"
    assert sorted(map(tuple, got.collect())) == _truth(spark, src)
    # stale_ok with only the child registered: serves the child's
    # consistent pre-commit state (old totals, not a torn mix)
    child_only = RW.RollupCatalog()
    child_only.register("by_t", by_t, src, ["t"], "v", parent_dir=daily)
    got2, why2 = RW.answer_aggregate(
        spark, child_only, src, ["t"], AGGS, freshness="stale_ok"
    )
    assert why2["used"] == "rollup"
    assert {
        r["t"]: (r["n"], r["total"]) for r in got2.collect()
    } == pre
    # resume: the child tick converges the lattice
    assert ivm.maintain_rollup_from_rollup(
        spark, daily, by_t, {"t": "t"}
    )["mode"] == "delta"
    got3, why3 = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert why3["rollup"] == "by_t"
    assert sorted(map(tuple, got3.collect())) == _truth(spark, src)


def test_parent_rollback_after_child_tick(spark, tmp_path):
    """Window (c): the whole chain is fresh, then the PARENT rollup
    is rolled back (its content reverts, its stamp history does
    not). The child must stop serving (its applied parent version no
    longer matches the parent's current), the documented repair —
    rebuild the parent, re-tick the child — must converge, and a
    replayed tick after repair is a no-op."""
    src, daily, by_t, cat = _chain(spark, tmp_path)
    _merge(spark, src, [(900, 1, "t0", 50)], op=None)
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    ivm.maintain_rollup_from_rollup(spark, daily, by_t, {"t": "t"})
    daily_v = SN.current_version(daily)
    SN.rollback(daily, 0)  # parent content reverts; version ADVANCES
    assert SN.current_version(daily) == daily_v + 1
    # the child's chain is no longer provably consistent: strict
    # must not serve it (its last applied parent version != parent
    # current)
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert all(
        s["rollup"] != "by_t" or s["reason"].startswith("stale")
        for s in why["skipped"]
    )
    assert why.get("rollup") != "by_t"
    # repair per maintain_rollup's docstring: rebuild the rolled-back
    # parent, then re-tick the child
    assert ivm.maintain_rollup(
        spark, src, daily, ["day", "t"], "v", rebuild=True
    )["mode"] == "rebuild"
    assert ivm.maintain_rollup_from_rollup(
        spark, daily, by_t, {"t": "t"}
    )["mode"] == "delta"
    got2, why2 = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert why2["used"] == "rollup" and why2["rollup"] == "by_t"
    assert sorted(map(tuple, got2.collect())) == _truth(spark, src)
    # replayed child tick after repair: no-op, state unchanged
    assert ivm.maintain_rollup_from_rollup(
        spark, daily, by_t, {"t": "t"}
    )["mode"] == "noop"
    got3, _ = RW.answer_aggregate(spark, cat, src, ["t"], AGGS)
    assert sorted(map(tuple, got3.collect())) == sorted(
        map(tuple, got2.collect())
    )


def test_quantile_chain_crash_between_parent_and_child_tick(
    spark, tmp_path
):
    """r10: the DDSketch aux chain under the same window (c) the sum
    lattice is pinned for — parent ticked, process dies before the
    child tick. Strict never serves the lagging child; the resumed
    child tick converges to the direct-from-base sketch BIT-exactly
    (bucket adds are associative)."""
    src = str(tmp_path / "qsrc")
    daily = str(tmp_path / "qdaily")
    weekly = str(tmp_path / "qweekly")
    # the child key must be base-resolvable (identity key_exprs —
    # the RollupSpec registration contract), so week is carried as
    # a base column
    rows = [(i, i % 14, (i % 14) // 7, (i * 11) % 500) for i in range(120)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "day", "week", "v"])
    )
    ivm.maintain_aux_rollup(
        spark, src, daily, ["day", "week"], "v", kind="quantile"
    )
    ivm.maintain_aux_rollup_from_rollup(
        spark, daily, weekly, {"week": "week"}, kind="quantile"
    )
    cat = RW.RollupCatalog()
    cat.register(
        "qdaily", daily, src, ["day", "week"], "v", kind="quantile"
    )
    cat.register(
        "qweekly", weekly, src, ["week"], "v",
        parent_dir=daily, kind="quantile",
    )
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(900, 1, 0, 444)], ["k", "day", "week", "v"]),
        key="k",
    )
    ivm.maintain_aux_rollup(
        spark, src, daily, ["day", "week"], "v", kind="quantile"
    )
    # CRASH: child tick never ran. Strict falls back; the child is
    # reported stale, the parent fresh.
    aggs = {"p50": ("approx_percentile@0.5", "v")}
    got, why = RW.answer_aggregate(spark, cat, src, ["day"], aggs)
    assert why["used"] == "rollup" and why["rollup"] == "qdaily"
    got2, why2 = RW.answer_aggregate(spark, cat, src, ["week"], aggs)
    # the FRESH parent (grouped by day, week) still answers the week
    # grouping exactly; the lagging child is skipped as stale — never
    # served under strict
    assert why2["used"] == "rollup" and why2["rollup"] == "qdaily"
    reasons = {s["rollup"]: s["reason"] for s in why2["skipped"]}
    assert reasons["qweekly"].startswith("stale")
    # resume = run the child tick; it converges and answers
    ivm.maintain_aux_rollup_from_rollup(
        spark, daily, weekly, {"week": "week"}, kind="quantile"
    )
    got3, why3 = RW.answer_aggregate(spark, cat, src, ["week"], aggs)
    assert why3["rollup"] == "qweekly"  # now cheapest AND fresh
    # the child-chain estimate BIT-equals the parent-partials
    # estimate (one additive sketch, associative adds)
    assert sorted(map(tuple, got3.collect())) == sorted(
        map(tuple, got2.collect())
    )
