"""Cross-engine-deterministic hash expressions.

The driver's correctness gate hash-compares Spark results against
DuckDB (ANSI SQL) results, so every hash used in a checked operator
must produce IDENTICAL integers in both engines. Spark's native
``F.hash``/``F.xxhash64`` are Spark-specific (murmur3/xxhash with
Spark seeds), so instead all hashing here derives from **md5**, which
both engines expose with identical semantics (lowercase hex of the
UTF-8 bytes):

- Spark:  ``conv(substring(md5(s), 1, k), 16, 10)``  → decimal string → long
- DuckDB: ``CAST('0x' || substr(md5(s), 1, k) AS BIGINT)``

k=15 hex chars = 60 bits (fits signed 64-bit, non-negative);
k=8 = 32 bits, reduced mod 2^31-1 for minhash arithmetic headroom.

Verified bit-identical across engines for ASCII, UTF-8 multibyte,
and empty strings (pinned-value contract: tests/test_text_ops.py).

md5 is ~2-3x slower than murmur3 per call but runs JVM-side inside
whole-stage codegen; at 100 TB the scan, not the hash, dominates.
A production deployment free of the cross-engine-oracle constraint
would swap in ``F.xxhash64`` — the call sites are isolated here so
that is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Mersenne prime 2^31 - 1; minhash values live in [0, P31).
P31 = 2_147_483_647

#: Modulus for the polynomial rolling hash (fits acc*31+c in int64).
ROLL_MOD = 1_000_000_007


def md5_long60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    DuckDB twin: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long31(col: Column | str) -> Column:
    """md5-derived integer in [0, 2^31-1) — minhash base hash.

    DuckDB twin:
    ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2147483647``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % P31


def rolling_hash(col_sql: str, mod: int = ROLL_MOD) -> Column:
    """Polynomial rolling hash ``acc = (acc*31 + codepoint) % mod``
    over the string's characters, left to right.

    ``col_sql`` is a SQL expression string (column name or scalar
    expression) so the lambda can reference it positionally.

    Guarded for empty strings (Spark's ``sequence(1, 0)`` yields the
    DESCENDING sequence [1, 0], not []). All arithmetic stays in
    int64: acc < mod ≤ 1e9+7, so acc*31 + c < 3.2e10 << 2^63.

    DuckDB twin (list_reduce needs the seed prepended)::

        list_reduce(
          list_concat([CAST(0 AS BIGINT)],
            list_transform(range(1, length(x)+1),
                           i -> CAST(unicode(x[i]) AS BIGINT))),
          (acc, c) -> (acc * 31 + c) % {mod})
    """
    expr = (
        "CASE WHEN char_length({x}) = 0 THEN 0L ELSE "
        "aggregate(sequence(1, char_length({x})), 0L, "
        "(acc, i) -> (acc * 31 + ascii(substring({x}, i, 1))) % {mod}) END"
    )
    return F.expr(expr.format(x=col_sql, mod=mod))


# --- Spark-side SQL text fragments ----------------------------------------
# (for call sites that build plan strings rather than Columns —
# keeping them here preserves the one-place-to-swap-the-hash
# property the module docstring promises)

def spark_md5_long60(x: str) -> str:
    return f"CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def spark_md5_long31(x: str) -> str:
    return f"(CAST(conv(substring(md5({x}), 1, 8), 16, 10) AS BIGINT) % {P31})"


# --- DuckDB-side twins (SQL text fragments) -------------------------------

def sql_md5_long60(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def sql_md5_long31(x: str) -> str:
    return f"(CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT) % {P31})"


def sql_rolling_hash(x: str, mod: int = ROLL_MOD) -> str:
    return (
        "list_reduce(list_concat([CAST(0 AS BIGINT)], "
        f"list_transform(range(1, length({x})+1), "
        f"i -> CAST(unicode({x}[i]) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {mod})"
    )
