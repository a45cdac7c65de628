"""Driver-contract integrity guards (no SparkSession needed — fast).

Protects the __spark_entry__ wiring against future-round mistakes:
every query callable must be importable, every oracle must be valid
DuckDB SQL against the fixture schema (EXPLAIN parses and binds
without executing), and the documented no-oracle exceptions must
stay an explicit, short list."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: queries() entries deliberately lacking an oracle (iterative /
#: not SQL-expressible). Adding to this list is an explicit act.
NO_ORACLE_ALLOWED = {
    # Iterative label propagation — pinned vs Python union-find.
    "dedup_components",
    # Eigendecomposition — pinned vs numpy.linalg.eigh.
    "embedding_pca",
    # Ridge matrix solve — pinned vs numpy.linalg.solve.
    "quality_classifier",
    # Greedy BPE merge loop — pinned vs the pure-Python reference.
    "bpe_encode",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def test_every_query_is_callable():
    qs = entry.queries()
    assert qs, "queries() is empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_coverage_is_total_minus_documented_exceptions():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(oracles)
    assert missing == NO_ORACLE_ALLOWED, (
        f"queries without an oracle beyond the documented set: "
        f"{missing - NO_ORACLE_ALLOWED}; stale exceptions: "
        f"{NO_ORACLE_ALLOWED - missing}"
    )
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracles with no query: {orphans}"


def test_every_oracle_parses_and_binds_in_duckdb(duck):
    for name, sql in entry.oracle_sql().items():
        try:
            duck.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - failure detail
            pytest.fail(f"oracle for {name!r} does not bind: {exc}")


#: DuckDB type-string fragments that mark a non-scalar column. The
#: driver's pandas canonicalizer sort_values over all columns dies on
#: unhashable cells (lists/structs/maps) — r4's only red row
#: (inverted_postings) was exactly this, with correct values.
_NON_SCALAR_DUCK = ("[]", "STRUCT(", "MAP(", "UNION(")


def test_every_oracle_output_column_is_scalar(duck):
    """DESCRIBE each oracle (binds without executing) and reject any
    list/struct/map output column — serialize with array_to_string
    before projecting. The Spark-side twin lives in
    tests/test_output_schema_lint.py."""
    for name, sql in entry.oracle_sql().items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            assert not any(tag in typ.upper() for tag in _NON_SCALAR_DUCK), (
                f"{name}.{col} has non-scalar oracle type {typ}; the driver "
                f"canonicalizer cannot hash it — array_to_string it"
            )
