"""Behavioral tests for the round-2 additions the oracle can't see:
the weighted sampler's BIAS (the oracle only proves both engines
draw the same sample, not that weights matter) and the CDC merge's
bookkeeping invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators import maintenance as MT
from ensembl_lakehouse_spark.operators import relational as R
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_weighted_sample_prefers_heavy_docs(spark):
    """Efraimidis–Spirakis: inclusion probability rises with weight.
    Compare inclusion RATES between the max-weight stratum and the
    light (w ≤ half-cap) stratum — the corpus is weight-saturated
    (most docs sit at the cap), so mean-weight comparisons are
    mushy, but the per-stratum rates separate cleanly (measured
    0.43 vs 0.21 on the fixed corpus; deterministic hash → a fixed
    number, asserted with margin)."""
    sampled = {r.doc_id for r in R.sample_weighted(spark, SF_DIR).collect()}
    w = (
        f"greatest(1, least({R.WEIGHTED_SAMPLE_MAX_W}, "
        f"size(split(trim(text), '\\\\s+'))))"
    )
    weights = {
        r.doc_id: r.w
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.expr(w).alias("w"))
        .collect()
    }
    cap = R.WEIGHTED_SAMPLE_MAX_W
    heavy = [d for d, wt in weights.items() if wt == cap]
    light = [d for d, wt in weights.items() if wt <= cap // 2]
    assert heavy and light
    rate_heavy = sum(d in sampled for d in heavy) / len(heavy)
    rate_light = sum(d in sampled for d in light) / len(light)
    assert rate_heavy > 1.5 * rate_light, (rate_heavy, rate_light)


def test_weighted_sample_is_deterministic(spark):
    a = {r.doc_id for r in R.sample_weighted(spark, SF_DIR).collect()}
    b = {r.doc_id for r in R.sample_weighted(spark, SF_DIR).collect()}
    assert a == b and len(a) == R.WEIGHTED_SAMPLE_N


def test_merge_upsert_invariants(spark):
    """Merge bookkeeping: every target key survives exactly once,
    every insert key appears exactly once, tags partition the result
    and agree with the CDC feed's own counts."""
    orders = load_table(spark, SF_DIR, "orders")
    n_target = orders.count()
    n_updates = orders.where(F.col("o_orderkey") % MT._UPDATE_MOD == 0).count()
    n_inserts = orders.where(
        F.col("o_orderkey") % MT._INSERT_MOD == MT._INSERT_REM
    ).count()

    merged = MT.merge_upsert(spark, SF_DIR)
    by_tag = {r.change_type: r.n for r in merged.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert by_tag.get("U", 0) == n_updates
    assert by_tag.get("I", 0) == n_inserts
    assert by_tag.get("K", 0) == n_target - n_updates
    assert merged.count() == n_target + n_inserts
    # keys stay unique through the merge (PK preserved)
    assert merged.select("o_orderkey").distinct().count() == n_target + n_inserts
    # updated rows actually carry the update
    assert (
        merged.where(F.col("change_type") == "U")
        .where(F.col("o_orderstatus") != "P")
        .count()
        == 0
    )


def test_salted_join_matches_unsalted(spark):
    """Pure-Spark twin of the oracle check: the salt rewrite must be
    invisible in the result."""
    salted = {
        (r.s_suppkey, r.revenue, r.n_items)
        for r in MT.join_skew_salted(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    supp = load_table(spark, SF_DIR, "supplier")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)"))
    )
    plain = {
        (r.s_suppkey, r.revenue, r.n_items)
        for r in li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    assert salted == plain


def test_mix_sources_hits_exact_mixture(spark):
    """The mixture invariant: every heavy source keeps exactly
    heavy_weight·units rows, every tail source tail_weight·units,
    where units is fixed by the bottleneck source — and the selection
    is a subset of the corpus, reproducible run-to-run."""
    from ensembl_lakehouse_spark.operators import pipeline as P
    from ensembl_lakehouse_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    out = P.mix_sources(spark, SF_DIR)
    per_source = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    src_counts = {
        r.source: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    units = min(
        n // (P.MIX_HEAVY_WEIGHT if s in P.MIX_HEAVY_SOURCES else P.MIX_TAIL_WEIGHT)
        for s, n in src_counts.items()
    )
    for s, n in per_source.items():
        expect = (P.MIX_HEAVY_WEIGHT if s in P.MIX_HEAVY_SOURCES else P.MIX_TAIL_WEIGHT) * units
        assert n == expect, (s, n, expect)
    # determinism: second run selects the identical doc_ids
    again = {tuple(r) for r in P.mix_sources(spark, SF_DIR).collect()}
    assert {tuple(r) for r in out.collect()} == again


def test_kanon_audit_partitions_table(spark):
    from ensembl_lakehouse_spark.operators import pipeline as P
    from ensembl_lakehouse_spark.sources.tables import load_table

    rows = P.privacy_kanon_audit(spark, SF_DIR).collect()
    assert rows
    n_total = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.class_size for r in rows) == n_total
    for r in rows:
        assert r.violates_k == (r.class_size < P.K_ANON)
        assert abs(r.class_share - r.class_size / n_total) < 1e-12


def test_epoch_shuffle_is_permutation_and_epochs_differ(spark):
    from ensembl_lakehouse_spark.operators import pipeline as P

    rows = P.epoch_shuffle(spark, SF_DIR).collect()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append((r.position, r.doc_id))
    assert set(by_epoch) == set(range(P.N_EPOCHS))
    orders = []
    all_docs = None
    for _, entries in sorted(by_epoch.items()):
        entries.sort()
        positions = [p for p, _ in entries]
        docs = [d for _, d in entries]
        assert positions == list(range(1, len(entries) + 1))
        if all_docs is None:
            all_docs = sorted(docs)
        assert sorted(docs) == all_docs  # same population every epoch
        orders.append(docs)
    assert orders[0] != orders[1]  # different permutation per epoch


def test_sliding_distinct_matches_bruteforce(spark):
    """Rolling 7-day distinct users vs a per-day Python recount."""
    from collections import defaultdict

    from ensembl_lakehouse_spark.operators import relational as R

    got = {
        r.day: r.rolling_users
        for r in R.events_sliding_distinct(spark, SF_DIR).collect()
    }
    pairs = {
        (str(r.d), r.user_id)
        for r in load_table(spark, SF_DIR, "events")
        .selectExpr("to_date(ts) AS d", "user_id")
        .collect()
    }
    days = sorted({d for d, _ in pairs})
    by_day = defaultdict(set)
    for d, u in pairs:
        by_day[d].add(u)
    import datetime

    for day in days:
        dt = datetime.date.fromisoformat(day)
        want = set()
        for back in range(R.SLIDING_DISTINCT_DAYS):
            want |= by_day.get(str(dt - datetime.timedelta(days=back)), set())
        assert got[day] == len(want), day
    assert set(got) == set(days)


def test_asof_forward_matches_bruteforce(spark):
    """Forward as-of pinned against a per-user Python recompute."""
    got = {
        r.click_id: (r.next_purchase_id, r.delay_sec, r.converted)
        for r in R.events_asof_forward(spark, SF_DIR).collect()
    }
    evs = (
        load_table(spark, SF_DIR, "events")
        .where("event_type IN ('click', 'purchase')")
        .collect()
    )
    by_user = {}
    for e in evs:
        by_user.setdefault(e.user_id, []).append(e)
    import math

    for u, rows in by_user.items():
        rows.sort(key=lambda e: (e.ts, e.event_id))
        for i, e in enumerate(rows):
            if e.event_type != "click":
                continue
            nxt = next(
                (
                    p
                    for p in rows[i:]
                    if p.event_type == "purchase"
                    and (p.ts, p.event_id) >= (e.ts, e.event_id)
                ),
                None,
            )
            want_id = nxt.event_id if nxt else None
            got_id, delay, conv = got[e.event_id]
            assert got_id == want_id, e.event_id
            if nxt is None:
                assert delay is None and conv is False
            else:
                want_delay = math.floor(nxt.ts.timestamp()) - math.floor(
                    e.ts.timestamp()
                )
                assert delay == want_delay
                assert conv == (delay <= R.ASOF_FORWARD_HORIZON_SEC)


def test_group_median_matches_python_order_stats(spark):
    rows = R.group_median(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice",
        "l_orderkey", "l_linenumber",
    ).collect()
    import math
    from collections import defaultdict

    groups = defaultdict(list)
    for r in li:
        groups[(r.l_returnflag, r.l_linestatus)].append(
            (r.l_extendedprice, r.l_orderkey, r.l_linenumber)
        )
    for row in rows:
        vals = sorted(groups[(row.l_returnflag, row.l_linestatus)])
        n = len(vals)
        assert row.n_rows == n
        assert row.p25 == vals[math.ceil(n / 4) - 1][0]
        assert row.median == vals[math.ceil(n / 2) - 1][0]
        assert row.p75 == vals[math.ceil(3 * n / 4) - 1][0]
