"""Cross-engine statistical expression builders (the vectors.py
pattern for moment statistics): ONE template string serves both the
Spark ``F.expr`` and the DuckDB oracle text, so the two engines'
expression trees cannot drift — the memory-pinned determinism rule
that keeps fixed-point results hash-identical."""

from __future__ import annotations


def pearson_e6(
    n: str = "n", sx: str = "sx", sy: str = "sy",
    sxy: str = "sxy", sxx: str = "sxx", syy: str = "syy",
) -> str:
    """Pearson correlation ×1e6 as BIGINT from integer moment sums.

    Exactness contract: the six inputs are BIGINT aggregates (no
    float accumulated anything); the numerator and both variance
    terms are exact integers; SQRT on a double is IEEE-754
    correctly rounded (algebraic, not transcendental), the divide is
    correctly rounded, and FLOOR of the identical double is the
    identical BIGINT — both engines evaluate this exact tree.
    Callers must pre-filter ``n > 1 AND n·sxx − sx² > 0 AND
    n·syy − sy² > 0`` (zero-variance series have no correlation).
    """
    return (
        f"CAST(FLOOR((CAST({n} * {sxy} - {sx} * {sy} AS DOUBLE)"
        f" * 1000000.0)"
        f" / (SQRT(CAST({n} * {sxx} - {sx} * {sx} AS DOUBLE))"
        f" * SQRT(CAST({n} * {syy} - {sy} * {sy} AS DOUBLE)))) AS BIGINT)"
    )
