"""Vectorized Pandas-UDF extension point (SURVEY §2 UDF row).

The engine's rule is "no Python in the hot path": every oracle-
checked operator is pure JVM codegen. But a complete engine needs a
*sanctioned* extension surface for the cases codegen can't win:

- very wide vectors (≥1k dims), where numpy's SIMD dot beats the
  per-element higher-order-function loop and the Arrow transfer
  amortizes;
- logic that genuinely needs a Python library (see
  operators/multimodal.decode_payloads for the mapInPandas variant).

``cosine_udf`` is that surface for vector math: an Arrow-batched
Series→Series scalar UDF, numerically equivalent to
functions/vectors.cosine_similarity (same double math, associativity
differences bounded at 1e-12 — asserted in tests/test_pandas_ext.py,
which is why it is NOT used in oracle-checked queries: bit-identity
is the oracle contract, equivalence-within-epsilon is the UDF
contract).

At 100 TB the choice between this and the codegen expression is a
per-deployment benchmark away; both sides of the seam are tested so
swapping is a one-line change at the call site.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        xv = np.asarray(x, dtype=np.float64)
        yv = np.asarray(y, dtype=np.float64)
        denom = np.sqrt(xv @ xv) * np.sqrt(yv @ yv)
        out[i] = (xv @ yv) / denom if denom else float("nan")
    return pd.Series(out)


def cosine_udf(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched cosine similarity of two array<float|double>
    columns. Prefer functions/vectors.cosine_similarity (JVM) for
    ≤~256 dims; prefer this above that, where SIMD wins."""
    return _cosine_batch(a, b)


def ols_per_group(df, group_col: str, x_col: str, y_col: str):
    """Per-group least-squares fit via ``applyInPandas`` — the
    grouped-map face of the sanctioned Pandas seam (cosine_udf is
    the scalar face; streaming/stateful.py the stateful one;
    operators/multimodal.py the mapInPandas one).

    The shape to copy for any per-group Python model fit: each group
    becomes ONE pandas frame on one executor (so a group must fit in
    memory — at 100 TB that means fitting per bounded key, never per
    heavy-hitter key without a pre-aggregation), and the output
    schema is declared up front.

    Numerics contract, same as cosine_udf: equivalent to the exact
    closed form (operators/analytics.corr_price_qty computes the
    identical slope/intercept JVM-side from decimal co-moments)
    within float tolerance — asserted in tests/test_pandas_ext.py —
    NOT bit-identical, which is why it's a seam demo and not an
    oracle-checked query.
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(x)
        if n > 1 and np.ptp(x) > 0:
            slope, intercept = np.polyfit(x, y, 1)
        else:
            slope, intercept = float("nan"), float("nan")
        return pd.DataFrame(
            [[pdf[group_col].iloc[0], n, float(slope), float(intercept)]],
            columns=[group_col, "n", "slope", "intercept"],
        )

    return df.groupBy(group_col).applyInPandas(
        fit, f"{group_col} string, n long, slope double, intercept double"
    )
