"""The two-phase boundary-broadcast tiling primitive
(operators/tiling.py): bit-identical to ``ntile(n) OVER (ORDER BY
value, key)`` under every shape that exercises the fill rule —
duplicates, skew, DESC, n > N — while the returned plan stays
map-only (no window at all; the plan-shape half is pinned in
test_plan_discipline.test_no_global_window_on_sf_growing_input)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators.tiling import with_global_ntile


@pytest.fixture(scope="module")
def skewed(spark):
    random.seed(7)
    rows = [
        (i, random.choice([0, 0, 0, 5, -3, 1000, 7]) * random.randint(0, 50))
        for i in range(4007)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


@pytest.mark.parametrize(
    "n,desc", [(10, False), (4, True), (3, False), (5000, False)]
)
def test_matches_native_ntile_exactly(spark, skewed, n, desc):
    order = f"v {'DESC' if desc else 'ASC'}, k ASC"
    want = skewed.withColumn(
        "t", F.expr(f"ntile({n}) OVER (ORDER BY {order})")
    )
    got = with_global_ntile(skewed, "v", "k", n, "t", descending=desc)
    assert want.select("k", "t").exceptAll(got.select("k", "t")).count() == 0
    assert got.select("k", "t").exceptAll(want.select("k", "t")).count() == 0


def test_few_buckets_and_tiny_inputs(spark):
    tiny = spark.createDataFrame([(1, 5), (2, 5), (3, 4)], ["k", "v"])
    got = {
        r.k: r.t
        for r in with_global_ntile(
            tiny, "v", "k", 10, "t", buckets=2
        ).collect()
    }
    assert got == {3: 1, 1: 2, 2: 3}  # n > N: tile == rank
    empty = tiny.where("v > 100")
    assert with_global_ntile(empty, "v", "k", 4, "t").count() == 0


def test_packing_contract_is_verified_not_assumed(spark):
    neg_key = spark.createDataFrame([(-1, 5), (2, 6)], ["k", "v"])
    with pytest.raises(ValueError, match="exact packing"):
        with_global_ntile(neg_key, "v", "k", 2, "t")
    null_v = spark.createDataFrame(
        [(1, None), (2, 6)], "k int, v int"
    )
    with pytest.raises(ValueError, match="non-NULL"):
        with_global_ntile(null_v, "v", "k", 2, "t")


def test_multi_spec_matches_chained_native(spark, skewed):
    """with_global_ntiles shares the plan-build jobs across specs;
    the result must stay bit-identical to independent native ntile
    windows per spec."""
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntiles

    d2 = skewed.withColumn("w", F.expr("(k * 37) % 1000"))
    want = d2.withColumn(
        "a", F.expr("ntile(4) OVER (ORDER BY v ASC, k ASC)")
    ).withColumn(
        "b", F.expr("ntile(7) OVER (ORDER BY w DESC, k ASC)")
    )
    got = with_global_ntiles(
        d2, [("v", "k", 4, "a", False), ("w", "k", 7, "b", True)]
    )
    cols = ["k", "a", "b"]
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0


def test_literal_cache_skips_plan_build_jobs(spark, tmp_path, monkeypatch):
    """cache_ns memoizes the cutoff literals under the input-file
    fingerprint: first build pays exactly THREE eager evaluations
    for ANY number of specs — boundaries, per-bucket counts, and the
    exact boundary-rank selection (jobs-per-evaluation is AQE's
    business) — a repeat build over unchanged files pays ZERO, and
    rewriting the files invalidates (mtime/size change) so stale
    literals are never served."""
    import time

    from ensembl_lakehouse_spark.operators import tiling

    p = str(tmp_path / "tile_src")
    spark.createDataFrame(
        [(i, (i * 13) % 101, (i * 7) % 53) for i in range(500)],
        ["k", "v", "w"],
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    DataFrame = type(df)  # the concrete (classic) DataFrame class
    specs = [("v", "k", 4, "a", False), ("w", "k", 5, "b", True)]
    tiling._LITERAL_CACHE.clear()
    evals = []
    real_collect = DataFrame.collect
    monkeypatch.setattr(
        DataFrame,
        "collect",
        lambda self: (evals.append(1), real_collect(self))[1],
    )
    try:
        first = tiling.with_global_ntiles(df, specs, cache_ns="tct")
        assert len(evals) == 3, len(evals)

        repeat = tiling.with_global_ntiles(
            spark.read.parquet(p), specs, cache_ns="tct"
        )
        assert len(evals) == 3, len(evals)  # zero new evaluations
        monkeypatch.setattr(DataFrame, "collect", real_collect)
        assert sorted(map(tuple, first.collect())) == sorted(
            map(tuple, repeat.collect())
        )

        # rewrite with DIFFERENT content: fingerprint must miss and
        # the answers must reflect the new data, not the memo
        time.sleep(0.01)  # ensure mtime_ns moves even on coarse fs
        spark.createDataFrame(
            [(i, (i * 29) % 97, (i * 11) % 41) for i in range(300)],
            ["k", "v", "w"],
        ).coalesce(1).write.mode("overwrite").parquet(p)
        fresh = spark.read.parquet(p)
        want = fresh.withColumn(
            "a", F.expr("ntile(4) OVER (ORDER BY v ASC, k ASC)")
        ).withColumn("b", F.expr("ntile(5) OVER (ORDER BY w DESC, k ASC)"))
        got = tiling.with_global_ntiles(fresh, specs, cache_ns="tct")
        cols = ["k", "a", "b"]
        assert want.select(cols).exceptAll(got.select(cols)).count() == 0
        assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    finally:
        tiling._LITERAL_CACHE.clear()
