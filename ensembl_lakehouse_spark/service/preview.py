"""Result preview in the reference's Athena wire shape.

Reference GET /query/{id}/preview (app/main.py:361-424): returns
Athena's ``ResultSet.Rows`` — row 0 is the *header* (column names),
every cell is a stringly-typed ``{"VarCharValue": ...}``, metadata
stripped (:416), ``maxResults`` clamped to [1, 1000] with default 26
(:406-409; 26 = 25 data rows + the header row).

We reproduce that shape from the typed DataFrame: ``df.limit(n)``
collects only n rows (Spark pushes the limit into the scan —
CollectLimit — so preview cost is O(n), not O(result)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PREVIEW_DEFAULT = 26
PREVIEW_MIN = 1
PREVIEW_MAX = 1000


class PreviewBoundsError(ValueError):
    """400: maxResults outside [1, 1000] (reference app/main.py:409)."""


def _cell(value) -> dict:
    # Athena omits VarCharValue for NULL cells; non-null values are
    # rendered as strings (app/main.py:368-384 example payload).
    if value is None:
        return {}
    if isinstance(value, bool):
        return {"VarCharValue": str(value).lower()}
    return {"VarCharValue": str(value)}


def preview(df: DataFrame, max_results: int = PREVIEW_DEFAULT) -> dict:
    """First ``max_results`` rows (header row included) in Athena's
    ResultSet.Rows shape."""
    if not (PREVIEW_MIN <= max_results <= PREVIEW_MAX):
        raise PreviewBoundsError(
            f"maxResults must be within [{PREVIEW_MIN}, {PREVIEW_MAX}], got {max_results}"
        )
    columns = df.columns
    header = {"Data": [{"VarCharValue": c} for c in columns]}
    data_rows = df.limit(max_results - 1).collect()
    rows = [header] + [{"Data": [_cell(row[c]) for c in columns]} for row in data_rows]
    return {"Rows": rows}
