"""Materialized-view rewrite: a rollup-answered aggregate equals
the base-table aggregate exactly (full keys, subset regroup, global
agg), strict freshness falls back on staleness, non-derivable
requests fall back with a recorded reason, and the rollup path
provably never touches base-table files."""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark import ivm
from ensembl_lakehouse_spark import snapshots as SN
from ensembl_lakehouse_spark.plans import rewrite as RW


@pytest.fixture()
def fixture(spark, tmp_path):
    src = str(tmp_path / "src")
    rol = str(tmp_path / "rollup")
    rows = [(i, f"g{i % 3}", f"r{i % 2}", i * 7) for i in range(60)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "grp", "reg", "val"])
    )
    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    cat = RW.RollupCatalog()
    cat.register("by_grp_reg", rol, src, ["grp", "reg"], "val")
    return src, rol, cat


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


AGGS = {
    "n": ("count", "val"),
    "total": ("sum", "val"),
    "mean": ("avg", "val"),
}


def test_rewrite_equals_base_on_full_subset_and_global(spark, fixture):
    src, rol, cat = fixture
    for group_by in (["grp", "reg"], ["grp"], []):
        got, why = RW.answer_aggregate(spark, cat, src, group_by, AGGS)
        assert why["used"] == "rollup", why
        empty = RW.RollupCatalog()  # base path = ground truth
        want, why_b = RW.answer_aggregate(spark, empty, src, group_by, AGGS)
        assert why_b["used"] == "base"
        assert _sorted(got) == _sorted(want)


def test_rollup_answer_reads_only_rollup_files(spark, fixture):
    src, rol, cat = fixture
    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "rollup"
    files = got.inputFiles()
    assert files and all(rol in f for f in files)
    assert not any(src in f for f in files)


def test_strict_freshness_falls_back_then_recovers(spark, fixture):
    src, rol, cat = fixture
    extra = spark.createDataFrame(
        [(1000, "g0", "r0", 999_983)], ["k", "grp", "reg", "val"]
    )
    SN.write_snapshot(src, extra, mode="append")

    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "base"
    assert why["skipped"][0]["reason"].startswith("stale")
    by_grp = {r.grp: r for r in got.collect()}
    assert by_grp["g0"].total >= 999_983  # fallback sees the new row

    stale, why_s = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, freshness="stale_ok"
    )
    assert why_s["used"] == "rollup"
    assert {r.grp: r.total for r in stale.collect()}["g0"] == (
        by_grp["g0"].total - 999_983
    )

    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    got2, why2 = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why2["used"] == "rollup"
    assert _sorted(got2) == _sorted(got)


def test_non_derivable_requests_fall_back_with_reason(spark, fixture):
    src, rol, cat = fixture
    # measure column the rollup does not maintain
    _, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"s": ("sum", "k")}
    )
    assert why["used"] == "base"
    assert "maintains sum(val)" in why["skipped"][0]["reason"]
    # non-self-maintainable aggregate
    _, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"m": ("min", "val")}
    )
    assert why["used"] == "base"
    assert "not derivable" in why["skipped"][0]["reason"]
    # group key outside the rollup's keys
    _, why = RW.answer_aggregate(spark, cat, src, ["k"], AGGS)
    assert why["used"] == "base"
    assert "not in rollup keys" in why["skipped"][0]["reason"]


def test_tombstoned_groups_never_resurface(spark, fixture):
    src, rol, cat = fixture
    # drop group g2 entirely via overwrite, then maintain
    kept = SN.read_snapshot(spark, src).where("grp <> 'g2'")
    SN.write_snapshot(src, kept, mode="overwrite")
    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    got, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["used"] == "rollup"
    assert "g2" not in {r.grp for r in got.collect()}


def test_cheapest_matching_rollup_wins(spark, fixture):
    src, rol, cat = fixture
    rol2 = rol + "_coarse"
    ivm.maintain_rollup(spark, src, rol2, ["grp"], "val")
    cat.register("by_grp", rol2, src, ["grp"], "val")
    _, why = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why["rollup"] == "by_grp"  # fewer keys ⇒ preferred
    _, why = RW.answer_aggregate(spark, cat, src, ["grp", "reg"], AGGS)
    assert why["rollup"] == "by_grp_reg"  # coarse one can't serve
    assert why["skipped"][0]["rollup"] == "by_grp"


def test_metadata_counts_answer_without_reading_data(spark, fixture):
    src, rol, cat = fixture
    from ensembl_lakehouse_spark import snapshots as SN

    # manifest rowcount agrees with the scan at every version
    assert SN.table_rowcount(src) == SN.read_snapshot(spark, src).count()

    got, why = RW.answer_aggregate(
        spark, cat, src, [], {"n": ("count", ""), "m": ("count", "x")}
    )
    assert why["used"] == "metadata"
    assert got.inputFiles() == []  # zero data reads — a local relation
    row = got.collect()[0]
    assert row.n == row.m == 60

    # stays exact through COW DML (update rewrites, delete removes)
    SN.update_snapshot(spark, src, where="k < 5", set={"val": "val + 1"})
    SN.delete_snapshot(spark, src, where="k >= 55")
    assert SN.table_rowcount(src) == 55
    got2, why2 = RW.answer_aggregate(spark, cat, src, [], {"n": ("count", "")})
    assert why2["used"] == "metadata"
    assert got2.collect()[0].n == 55

    # grouping or non-count measures never take the metadata path
    _, why3 = RW.answer_aggregate(spark, cat, src, ["grp"], {"n": ("count", "")})
    assert why3["used"] != "metadata"
    _, why4 = RW.answer_aggregate(spark, cat, src, [], {"s": ("sum", "val")})
    assert why4["used"] != "metadata"


def test_filtered_rewrite_equals_base_both_freshness_modes(spark, fixture):
    """r7 (VERDICT #4a): an equality/IN filter on rollup group keys
    selects whole groups, so the rollup answer must equal the base
    answer exactly — pinned at strict AND stale_ok freshness."""
    src, rol, cat = fixture
    empty = RW.RollupCatalog()
    for filters in (
        {"grp": ["g0"]},
        {"grp": ["g0", "g2"], "reg": "r1"},  # scalar value form too
    ):
        for freshness in ("strict", "stale_ok"):
            got, why = RW.answer_aggregate(
                spark, cat, src, ["grp"], AGGS,
                freshness=freshness, filters=filters,
            )
            assert why["used"] == "rollup", why
            want, why_b = RW.answer_aggregate(
                spark, empty, src, ["grp"], AGGS,
                freshness=freshness, filters=filters,
            )
            assert why_b["used"] == "base"
            assert _sorted(got) == _sorted(want)
    # filtered GLOBAL aggregate: rollup still answers, still exact
    got, why = RW.answer_aggregate(
        spark, cat, src, [], AGGS, filters={"reg": ["r0"]}
    )
    assert why["used"] == "rollup"
    want, _ = RW.answer_aggregate(
        spark, empty, src, [], AGGS, filters={"reg": ["r0"]}
    )
    assert _sorted(got) == _sorted(want)


def test_filter_on_non_key_falls_back_metadata_never_filtered(spark, fixture):
    src, rol, cat = fixture
    # filter column outside the rollup's group keys → base, loudly
    _, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, filters={"k": [1, 2]}
    )
    assert why["used"] == "base"
    assert "filter column" in why["skipped"][0]["reason"]
    # a filtered global COUNT must never take the metadata tier
    # (manifest totals are unfiltered) — here the rollup serves it
    got, why2 = RW.answer_aggregate(
        spark, cat, src, [], {"n": ("count", "")}, filters={"grp": ["g0"]}
    )
    assert why2["used"] == "rollup"
    assert got.collect()[0].n == 20


def test_cheapest_rollup_by_recorded_rowcount(spark, fixture):
    """r7 (VERDICT #4b): among eligible fresh rollups the fewest
    PHYSICAL ROWS wins (manifest rowcounts), and every runner-up is
    recorded in skipped with the cost it lost on."""
    src, rol, cat = fixture
    rol_g, rol_r = rol + "_g", rol + "_r"
    ivm.maintain_rollup(spark, src, rol_g, ["grp"], "val")  # 3 groups
    ivm.maintain_rollup(spark, src, rol_r, ["reg"], "val")  # 2 groups
    cat.register("by_grp", rol_g, src, ["grp"], "val")
    cat.register("by_reg", rol_r, src, ["reg"], "val")
    got, why = RW.answer_aggregate(
        spark, cat, src, [], {"total": ("sum", "val")}
    )
    # by_reg (2 rows) beats by_grp (3) and by_grp_reg (6); name order
    # alone would have picked by_grp — proves rowcount decides
    assert why["rollup"] == "by_reg"
    costlier = {
        s["rollup"]: s["reason"]
        for s in why["skipped"]
        if "costlier" in s["reason"]
    }
    assert set(costlier) == {"by_grp", "by_grp_reg"}
    assert "2 rollup rows" in costlier["by_grp"]
    assert got.collect()[0].total == sum(i * 7 for i in range(60))


def test_explicit_version_pin_controls_freshness_and_read(spark, fixture):
    """r7 ADVICE (engine.py:454 twin at the planner level): passing
    version= pins both the freshness decision and the base read —
    the engine uses this to honor write-audit-publish."""
    src, rol, cat = fixture
    SN.write_snapshot(
        src,
        spark.createDataFrame([(999, "g0", "r0", 1)], ["k", "grp", "reg", "val"]),
        mode="append",
    )  # src now at v1; rollup applied only v0
    # pinned at v0 the rollup IS fresh and answers
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, version=0
    )
    assert why["used"] == "rollup" and why["source_version"] == 0
    # unpinned (current v1) it is stale → base, and the base read
    # sees the appended row
    got1, why1 = RW.answer_aggregate(spark, cat, src, ["grp"], AGGS)
    assert why1["used"] == "base" and why1["source_version"] == 1
    n0 = {r.grp: r.n for r in got.collect()}
    n1 = {r.grp: r.n for r in got1.collect()}
    assert n1["g0"] == n0["g0"] + 1
    # the metadata COUNT(*) tier honors the pin too
    gm, whym = RW.answer_aggregate(
        spark, cat, src, [], {"n": ("count", "")}, version=0
    )
    assert whym["used"] == "metadata" and gm.collect()[0].n == 60


def test_stale_ok_never_serves_rollup_ahead_of_pin(spark, fixture):
    """r7 code review: stale_ok opts into OLDER data, never
    newer-than-the-pin data — a rollup maintained past the published
    pin holds staged rows and must be skipped, falling back to the
    base read AT the pin."""
    src, rol, cat = fixture
    # staged commit + maintenance tick: rollup now at v1
    SN.write_snapshot(
        src,
        spark.createDataFrame(
            [(777, "g0", "r0", 1_000_000)], ["k", "grp", "reg", "val"]
        ),
        mode="append",
    )
    ivm.maintain_rollup(spark, src, rol, ["grp", "reg"], "val")
    # pinned at v0 (the published state), stale_ok must NOT use the
    # v1-maintained rollup
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, freshness="stale_ok", version=0
    )
    assert why["used"] == "base" and why["source_version"] == 0
    assert any("ahead of the version pin" in s["reason"] for s in why["skipped"])
    totals = {r.grp: r.total for r in got.collect()}
    assert totals["g0"] < 1_000_000  # staged row absent
    # unpinned stale_ok still serves it (rollup == current, fresh)
    _, why2 = RW.answer_aggregate(
        spark, cat, src, ["grp"], AGGS, freshness="stale_ok"
    )
    assert why2["used"] == "rollup"


def test_hierarchical_child_answers_with_transitive_freshness(spark, tmp_path):
    """r7: a child rollup (weekly-from-daily lattice with identity
    keys) registered against the BASE answers when BOTH hops are
    applied to the base pin, wins the cheapest-cost pick over its
    parent, and falls back the moment either hop lags."""
    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    by_t = str(tmp_path / "by_t")
    rows = [(i, i % 14, f"t{i % 3}", i) for i in range(90)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "day", "t", "v"])
    )
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    ivm.maintain_rollup_from_rollup(spark, daily, by_t, {"t": "t"})
    cat = RW.RollupCatalog()
    cat.register("daily", daily, src, ["day", "t"], "v")
    cat.register("by_t", by_t, src, ["t"], "v", parent_dir=daily)

    aggs = {"n": ("count", ""), "total": ("sum", "v")}
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], aggs)
    assert why["used"] == "rollup" and why["rollup"] == "by_t"
    assert any("costlier" in s["reason"] for s in why["skipped"])
    empty = RW.RollupCatalog()
    want, _ = RW.answer_aggregate(spark, empty, src, ["t"], aggs)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # base commit: parent ticks, child does NOT → child chain stale,
    # parent (fresh) answers
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(900, 1, "t0", 50)], ["k", "day", "t", "v"]),
        key="k",
    )
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    got2, why2 = RW.answer_aggregate(spark, cat, src, ["t"], aggs)
    assert why2["used"] == "rollup" and why2["rollup"] == "daily"
    assert any(
        s["rollup"] == "by_t" and s["reason"].startswith("stale")
        for s in why2["skipped"]
    )

    # child catches up → child answers again, still exact
    ivm.maintain_rollup_from_rollup(spark, daily, by_t, {"t": "t"})
    got3, why3 = RW.answer_aggregate(spark, cat, src, ["t"], aggs)
    assert why3["rollup"] == "by_t"
    want3, _ = RW.answer_aggregate(spark, empty, src, ["t"], aggs)
    assert sorted(map(tuple, got3.collect())) == sorted(
        map(tuple, want3.collect())
    )

    # staged-past-the-pin at the PARENT hop blocks the child even
    # under stale_ok (the chain 'ahead' rule)
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(901, 2, "t1", 9)], ["k", "day", "t", "v"]),
        key="k",
    )  # src v2 (staged w.r.t. a v1 pin)
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    ivm.maintain_rollup_from_rollup(spark, daily, by_t, {"t": "t"})
    _, why4 = RW.answer_aggregate(
        spark, cat, src, ["t"], aggs, freshness="stale_ok", version=1
    )
    assert why4["used"] == "base"
    assert all(
        "ahead of the version pin" in s["reason"]
        for s in why4["skipped"]
        if s["rollup"] in ("daily", "by_t")
    )


def test_depth3_chain_never_leaks_staged_rows(spark, tmp_path):
    """r7 second review: a monthly←weekly←daily←base chain must
    compose freshness through EVERY hop via the lineage markers —
    comparing the grandchild's (weekly-version) stamps against base
    versions mixed version spaces and could serve staged rows under
    stale_ok. Pinned: the staged scenario now reads 'ahead' and
    falls back to base at the pin; the fully-ticked chain answers
    exactly."""
    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    weekly = str(tmp_path / "weekly")
    monthly = str(tmp_path / "monthly")
    rows = [(i, i % 56, f"t{i % 2}", i) for i in range(112)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "day", "t", "v"])
    )

    def tick_all():
        ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
        ivm.maintain_rollup_from_rollup(
            spark, daily, weekly, {"week": "day DIV 7", "t": "t"}
        )
        ivm.maintain_rollup_from_rollup(
            spark, weekly, monthly, {"month": "week DIV 4", "t": "t"}
        )

    tick_all()
    cat = RW.RollupCatalog()
    # lineage markers are discovered automatically — no parent_dir
    cat.register("monthly_t", monthly, src, ["t"], "v")
    assert cat._specs["monthly_t"].parent_dir is not None

    aggs = {"n": ("count", ""), "total": ("sum", "v")}
    got, why = RW.answer_aggregate(spark, cat, src, ["t"], aggs)
    assert why["used"] == "rollup" and why["rollup"] == "monthly_t"
    empty = RW.RollupCatalog()
    want, _ = RW.answer_aggregate(spark, empty, src, ["t"], aggs)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # stage base v1 and tick the WHOLE chain: pinned at v0, every
    # hop now derives from staged data → 'ahead', base answers
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(999, 1, "t0", 7)], ["k", "day", "t", "v"]),
        key="k",
    )
    tick_all()
    _, why2 = RW.answer_aggregate(
        spark, cat, src, ["t"], aggs, freshness="stale_ok", version=0
    )
    assert why2["used"] == "base"
    assert any(
        s["rollup"] == "monthly_t"
        and "ahead of the version pin" in s["reason"]
        for s in why2["skipped"]
    )

    # lagging LEAF hop (weekly/monthly not ticked for base v2):
    # strict falls back, stale_ok may serve the ≤-pin content
    SN.merge_snapshot(
        spark, src,
        spark.createDataFrame([(998, 2, "t1", 3)], ["k", "day", "t", "v"]),
        key="k",
    )
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")  # root only
    _, why3 = RW.answer_aggregate(spark, cat, src, ["t"], aggs)
    assert why3["used"] == "base"
    assert any(
        s["rollup"] == "monthly_t" and s["reason"].startswith("stale")
        for s in why3["skipped"]
    )
    got4, why4 = RW.answer_aggregate(
        spark, cat, src, ["t"], aggs, freshness="stale_ok"
    )
    assert why4["used"] == "rollup" and why4["rollup"] == "monthly_t"


def test_register_rejects_contradictory_parent(spark, tmp_path):
    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    weekly = str(tmp_path / "weekly")
    other = str(tmp_path / "other")
    SN.write_snapshot(
        src, spark.createDataFrame([(1, 0, "a", 1)], ["k", "day", "t", "v"])
    )
    ivm.maintain_rollup(spark, src, daily, ["day", "t"], "v")
    ivm.maintain_rollup(spark, src, other, ["t"], "v")
    ivm.maintain_rollup_from_rollup(
        spark, daily, weekly, {"week": "day DIV 7", "t": "t"}
    )
    cat = RW.RollupCatalog()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lineage-marked"):
        cat.register("w", weekly, src, ["t"], "v", parent_dir=other)


# --- r8: MIN/MAX, range filters, HLL sketch rollups -----------------


@pytest.fixture()
def aux_fixture(spark, tmp_path):
    src = str(tmp_path / "src")
    mm = str(tmp_path / "mm")
    hll = str(tmp_path / "hll")
    rows = [(i, f"g{i % 3}", f"r{i % 2}", i * 7, i % 11) for i in range(60)]
    SN.write_snapshot(
        src, spark.createDataFrame(rows, ["k", "grp", "reg", "val", "u"])
    )
    ivm.maintain_aux_rollup(spark, src, mm, ["grp", "reg"], "val")
    ivm.maintain_aux_rollup(spark, src, hll, ["grp", "reg"], "u", kind="hll")
    cat = RW.RollupCatalog()
    cat.register("mm_grp_reg", mm, src, ["grp", "reg"], "val", kind="minmax")
    cat.register("hll_grp_reg", hll, src, ["grp", "reg"], "u", kind="hll")
    return src, mm, hll, cat


def test_minmax_rewrite_equals_base(spark, aux_fixture):
    """MIN/MAX answered from the minmax rollup at every grouping
    granularity (min-of-mins regroups exactly), reading only rollup
    files; after a delete removes a group's extreme, strict falls
    back until maintenance, then the rollup answers again."""
    src, mm, hll, cat = aux_fixture
    aggs = {"lo": ("min", "val"), "hi": ("max", "val"), "n": ("count", "")}
    for group_by in (["grp", "reg"], ["grp"], []):
        got, why = RW.answer_aggregate(spark, cat, src, group_by, aggs)
        assert why["used"] == "rollup" and why["rollup"] == "mm_grp_reg"
        want, _ = RW.answer_aggregate(
            spark, RW.RollupCatalog(), src, group_by, aggs
        )
        assert _sorted(got) == _sorted(want)
    files = got.inputFiles()
    assert files and all(mm in f for f in files)
    # delete the global max row (k=59): strict falls back...
    SN.delete_snapshot(spark, src, "k = 59")
    got, why = RW.answer_aggregate(spark, cat, src, [], aggs)
    assert why["used"] == "base"
    # ...maintenance recomputes the touched group exactly; serves again
    ivm.maintain_aux_rollup(spark, src, mm, ["grp", "reg"], "val")
    got, why = RW.answer_aggregate(spark, cat, src, [], aggs)
    assert why["used"] == "rollup"
    want, _ = RW.answer_aggregate(
        spark, RW.RollupCatalog(), src, [], aggs
    )
    assert _sorted(got) == _sorted(want)


def test_minmax_rollup_rejects_sum_and_wrong_col(spark, aux_fixture):
    src, mm, hll, cat = aux_fixture
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"total": ("sum", "val")}
    )
    assert why["used"] == "base"
    reasons = {s["rollup"]: s["reason"] for s in why["skipped"]}
    assert "not derivable from a minmax rollup" in reasons["mm_grp_reg"]
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], {"lo": ("min", "u")}
    )
    assert why["used"] == "base"  # mm maintains minmax(val), not u


def test_range_filter_rewrite_equals_base(spark, aux_fixture):
    """BETWEEN on a rollup group key selects whole groups — answered
    from the rollup, equal to the base path, at both freshness
    modes; a range on a non-key column falls back."""
    src, mm, hll, cat = aux_fixture
    aggs = {"lo": ("min", "val"), "n": ("count", "")}
    for fresh in ("strict", "stale_ok"):
        got, why = RW.answer_aggregate(
            spark, cat, src, ["grp"], aggs, freshness=fresh,
            range_filters={"grp": ("g0", "g1")},
        )
        assert why["used"] == "rollup", why
        want, _ = RW.answer_aggregate(
            spark, RW.RollupCatalog(), src, ["grp"], aggs,
            range_filters={"grp": ("g0", "g1")},
        )
        assert _sorted(got) == _sorted(want)
        assert {r[0] for r in _sorted(got)} == {"g0", "g1"}
    # combined IN + range, still whole-group
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], aggs,
        filters={"reg": "r0"}, range_filters={"grp": ("g0", "g2")},
    )
    assert why["used"] == "rollup"
    want, _ = RW.answer_aggregate(
        spark, RW.RollupCatalog(), src, ["grp"], aggs,
        filters={"reg": "r0"}, range_filters={"grp": ("g0", "g2")},
    )
    assert _sorted(got) == _sorted(want)
    # range on a NON-key column slices within groups: fall back
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], aggs, range_filters={"k": (0, 10)},
    )
    assert why["used"] == "base"
    # metadata tier never answers a range-filtered global count
    got, why = RW.answer_aggregate(
        spark, cat, src, [], {"n": ("count", "")},
        range_filters={"grp": ("g0", "g0")},
    )
    assert why["used"] != "metadata"


def test_hll_rollup_answers_approx_distinct(spark, aux_fixture):
    """approx COUNT(DISTINCT) from the sketch-valued rollup equals
    the single-pass base sketch exactly (register-wise-max union
    determinism), at every grouping subset and under group-key
    filters; a delete forces fallback until maintenance."""
    src, mm, hll, cat = aux_fixture
    aggs = {"du": ("approx_count_distinct", "u"), "n": ("count", "")}
    for group_by in (["grp", "reg"], ["reg"], []):
        got, why = RW.answer_aggregate(spark, cat, src, group_by, aggs)
        assert why["used"] == "rollup" and why["rollup"] == "hll_grp_reg"
        want, _ = RW.answer_aggregate(
            spark, RW.RollupCatalog(), src, group_by, aggs
        )
        assert _sorted(got) == _sorted(want)
    got, why = RW.answer_aggregate(
        spark, cat, src, ["grp"], aggs, filters={"reg": ["r1"]}
    )
    assert why["used"] == "rollup"
    want, _ = RW.answer_aggregate(
        spark, RW.RollupCatalog(), src, ["grp"], aggs,
        filters={"reg": ["r1"]},
    )
    assert _sorted(got) == _sorted(want)
    # stale rollup: strict falls back, maintenance recovers
    SN.delete_snapshot(spark, src, "u = 3")
    got, why = RW.answer_aggregate(spark, cat, src, [], aggs)
    assert why["used"] == "base"
    ivm.maintain_aux_rollup(spark, src, hll, ["grp", "reg"], "u", kind="hll")
    got, why = RW.answer_aggregate(spark, cat, src, [], aggs)
    assert why["used"] == "rollup"
    want, _ = RW.answer_aggregate(spark, RW.RollupCatalog(), src, [], aggs)
    assert _sorted(got) == _sorted(want)


def test_aux_kind_validation(spark, tmp_path):
    cat = RW.RollupCatalog()
    with pytest.raises(ValueError, match="kind"):
        cat.register("x", str(tmp_path / "r"), str(tmp_path / "s"),
                     ["g"], "v", kind="median")
    # aux rollups MAY be hierarchical children since r9
    # (ivm.maintain_aux_rollup_from_rollup); registration with a
    # parent_dir is accepted and freshness composes through the chain
    cat.register("hier_ok", str(tmp_path / "r"), str(tmp_path / "s"),
                 ["g"], "v", kind="hll",
                 parent_dir=str(tmp_path / "p"))
    with pytest.raises(ValueError, match="pair"):
        RW.answer_aggregate(
            spark, cat, str(tmp_path / "s"), [], {"n": ("count", "")},
            range_filters={"g": (1,)},
        )
