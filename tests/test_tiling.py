"""The two-phase boundary-broadcast tiling primitive
(operators/tiling.py): bit-identical to ``ntile(n) OVER (ORDER BY
value, key)`` under every shape that exercises the fill rule —
duplicates, skew, DESC, n > N — while keeping every row_number
window partitioned (the plan-shape half is pinned in
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
