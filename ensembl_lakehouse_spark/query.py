"""Query construction: the reference's SELECT-project-filter surface.

The reference builds one SQL string —
``SELECT {fields} FROM {data_type} WHERE species='{species}'
{condition};`` (app/main.py:477-479) — with zero validation (a SQL
injection hole). Here the same semantics become a declarative
DataFrame plan:

- P1 projection  (app/main.py:460-463)  -> ``df.select``
- P2 key filter  (app/main.py:479)      -> ``df.where(col == value)``
- P3 condition   (app/main.py:463-466)  -> ``df.where(F.expr(cond))``

with validation instead of string interpolation: fields must be real
columns, and the condition must parse to a *boolean* expression over
the table's columns only (no subqueries or writes can sneak in
because ``F.expr`` parses a single scalar expression).

Scale note: expressing this as a plan (not a string sent to a remote
engine) is what buys predicate pushdown, column pruning and
partition pruning from Catalyst — the scan reads only the projected
columns and, with a species-partitioned layout, only the one
partition (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType
from pyspark.sql.utils import AnalysisException

from ensembl_lakehouse_spark.catalog import Catalog


class QueryValidationError(ValueError):
    """Client error: bad fields/condition (maps to HTTP 400, like the
    reference's InvalidRequestException branch, app/main.py:201-202)."""


def parse_fields(fields: str | None, available: list[str]) -> list[str]:
    """Parse the comma-separated ``fields`` parameter (P1).

    ``None``/blank/``*`` mean all columns (reference defaults
    ``fields='*'``, app/main.py:461). Unknown columns are a
    validation error (the reference would forward them to Athena and
    surface its error; we fail fast with the same 400 semantics).
    """
    if fields is None or fields.strip() in ("", "*"):
        return list(available)
    requested = [f.strip() for f in fields.split(",") if f.strip()]
    if not requested:
        return list(available)
    available_lower = {c.lower(): c for c in available}
    resolved = []
    for name in requested:
        actual = available_lower.get(name.lower())
        if actual is None:
            raise QueryValidationError(f"Unknown field: {name}")
        resolved.append(actual)
    return resolved


def validate_condition(df: DataFrame, condition: str) -> Column:
    """Validate the raw ``condition`` fragment (P3) and return it as
    a boolean Column.

    The reference interpolates this fragment into SQL unsanitized
    (app/main.py:477-479). We instead require it to (a) parse as a
    single Spark SQL expression, (b) analyze against the table's
    columns, (c) have boolean type. ``F.expr`` cannot contain a
    second statement, so injection is structurally impossible.
    """
    try:
        expr = F.expr(condition)
    except Exception as exc:  # pyspark raises ParseException subclasses
        raise QueryValidationError(f"Condition does not parse: {condition!r}: {exc}") from exc
    try:
        probe = df.select(expr.alias("__cond__"))
        dtype = probe.schema["__cond__"].dataType
    except AnalysisException as exc:
        raise QueryValidationError(
            f"Condition references unknown columns or functions: {condition!r}: {exc}"
        ) from exc
    if not isinstance(dtype, BooleanType):
        raise QueryValidationError(
            f"Condition must be a boolean expression, got {dtype.simpleString()}: {condition!r}"
        )
    return expr


def build_df(
    catalog: Catalog,
    data_type: str,
    key_value: str | None = None,
    fields: str | None = None,
    condition: str | None = None,
    key_column: str | None = None,
) -> DataFrame:
    """The reference's query template as a DataFrame plan.

    Equivalent to app/main.py:479's
    ``SELECT {fields} FROM {data_type}
    WHERE {key_column}='{key_value}' AND {condition}``.

    Filter-before-project order does not matter to Catalyst — it
    pushes both into the scan — but we keep the reference's logical
    shape. ``key_value=None`` skips the mandatory filter (used by
    internal callers; the public API layer requires it, matching the
    reference's path parameter).
    """
    df = catalog.table(data_type)
    columns = [f.name for f in df.schema.fields]

    if key_value is not None:
        key_col = key_column or catalog.key_column(data_type)
        if key_col is None:
            raise QueryValidationError(
                f"Table {data_type} has no configured key column for the mandatory filter"
            )
        df = df.where(F.col(key_col) == key_value)

    if condition is not None and condition.strip():
        df = df.where(validate_condition(df, condition.strip()))

    selected = parse_fields(fields, columns)
    df = df.select(*selected)
    return df
