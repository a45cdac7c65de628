"""Spark-side driver-hashability lint over the FULL queries()
inventory.

The driver canonicalizes results with pandas ``sort_values`` across
every column before hashing; a list/map/struct cell is unhashable
and crashes it before comparison — round 4's only red row
(``inverted_postings``) was exactly this failure with correct
values. This lint computes each query's **analyzed schema** (no job
execution for lazy plans) at sf0.001 and rejects any nested output
type anywhere in the inventory, so the class can't reappear.

The DuckDB-side twin (DESCRIBE over every oracle) lives in
tests/test_contract.py; the gate itself also fails nested types
(tools/check_oracle.py::nested_output_problems).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry
from tests.conftest import SF_DIR

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def schemas(spark):
    """Analyzed schema per query. Threaded (guide §2.6): plan
    construction runs eager checkpoint/tiling jobs for ~50 operators,
    and a serial loop pays 368 sequential build round-trips — the
    pool overlaps them (89 s → ~30 s of suite setup)."""
    from concurrent.futures import ThreadPoolExecutor

    items = list(entry.queries().items())

    def one(pair):
        name, fn = pair
        return name, fn(spark, SF_DIR).schema

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, items))


def test_every_query_output_column_is_scalar(schemas):
    bad = []
    for name, schema in schemas.items():
        for field in schema.fields:
            if isinstance(field.dataType, _NESTED):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "non-scalar output columns (driver canonicalizer cannot hash "
        "them — array_join to a string): " + "; ".join(bad)
    )


def test_lint_catches_a_regressed_inverted_postings(spark):
    """Deliberately rebuild the r4 red row's shape (an array<string>
    postings column) and prove the lint machinery flags it."""
    from tools.check_oracle import nested_output_problems

    df = spark.sql("SELECT 1 AS df, array('a', 'b') AS postings")
    problems = nested_output_problems(df.toArrow().schema, "spark")
    assert problems and "postings" in problems[0]
