"""Embedding-vector expressions via higher-order functions.

All math is index-ordered left-to-right in DOUBLE so the DuckDB
oracle (same order, same type) produces bit-identical IEEE results —
floating-point addition is not associative, so *order* is part of
the contract, not an implementation detail.

These are JVM-side codegen expressions: for 64-dim vectors the
per-row cost is a tight loop, no Python, no shuffle. For very wide
vectors (≥1k dims) a vectorized Pandas-UDF + numpy dot would win on
SIMD; at 64 dims the Arrow transfer overhead dominates, so
higher-order functions are the right local choice and the UDF
variant stays in operators/multimodal.py as the pattern reference.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_product(a_sql: str, b_sql: str) -> Column:
    """Σ a[i]·b[i] in index order, DOUBLE.

    DuckDB twin::

        list_reduce(list_concat([CAST(0 AS DOUBLE)],
          list_transform(range(1, len(a)+1),
                         i -> a[i]::DOUBLE * b[i]::DOUBLE)),
          (acc, x) -> acc + x)
    """
    return F.expr(
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        f"(x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)), "
        f"cast(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def l2_norm(a_sql: str) -> Column:
    """sqrt(Σ a[i]^2), index-ordered DOUBLE sum."""
    return F.sqrt(dot_product(a_sql, a_sql))


def cosine_similarity(a_sql: str, b_sql: str) -> Column:
    """dot(a,b) / (||a||·||b||), each factor index-ordered.

    The denominator multiplies the two norms BEFORE dividing —
    mirrored exactly in the SQL twin below.
    """
    return dot_product(a_sql, b_sql) / (l2_norm(a_sql) * l2_norm(b_sql))


# --- DuckDB twins ---------------------------------------------------------

def sql_dot(a: str, b: str) -> str:
    return (
        "list_reduce(list_concat([CAST(0 AS DOUBLE)], "
        f"list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
