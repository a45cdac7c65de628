"""Exact global NTILE without a single-partition window — the
two-phase boundary-broadcast tiling primitive (r8 VERDICT #4).

``ntile(n) OVER (ORDER BY v, k)`` is the one plan shape in the
operator library that funnels an SF-growing relation through ONE
task: Spark plans a global window as ``Exchange SinglePartition →
Window``, so at TPC-H 100× a ~10⁹-row supplier/customer tiling
serializes on a single executor core no matter how wide the cluster
is. This module replaces it with the classic two-phase formulation
every MPP engine uses for global ranking:

1. **Boundary + offset phase (two eager FULL-INPUT jobs at
   plan-build time — parallel, but real scans)**: the ordering tuple
   ``(value, key)`` is packed into one monotone DECIMAL(38,0)
   (``key`` must be a unique BIGINT — the same total-order
   requirement NTILE determinism already imposes); one aggregate
   collects ``approx_percentile`` bucket boundaries (plus the exact
   row count and the packing-safety maxima), a second counts rows
   per bucket and folds them into cumulative offsets. BOTH results
   become literals in the returned plan. Eager is load-bearing
   twice over: approx_percentile's merge order is not guaranteed
   deterministic (two independent lazy evaluations could bucket
   differently and corrupt the offsets), and a lazy counts branch
   would be a second consumer of the upstream whose column-pruned
   exchange never unifies with the rank branch's under
   ReuseExchange — each consumer re-evaluates the whole upstream
   DAG, which a chained tiling compounds into 2^k scans.
2. **Assignment phase (fully lazy, single-branch, fully parallel)**:
   each row's bucket is its boundary count (a broadcast O(B) lambda
   — B defaults to the session's shuffle parallelism),
   ``row_number() OVER (PARTITION BY bucket ORDER BY packed)`` ranks
   each bucket independently, and the global rank is
   ``literal_offset[bucket] + within-bucket rank`` — exact, because
   bucketing is monotone in the packed order.

The tile then derives from the exact global rank with the SQL
NTILE fill rule (first ``N mod n`` tiles take one extra row), so the
result is bit-identical to ``ntile(n) OVER (ORDER BY ...)`` under
the same total order — the DuckDB oracles for the three consumers
(supplier_balance_deciles, orders_rfm_segments,
customer_balance_spend_matrix) keep their plain-SQL ntile form.

Boundary-quality note: approx_percentile boundaries only balance
LOAD; correctness never depends on them. A pathological sketch
would skew bucket sizes, not answers.

Cost placement note: because the boundary job runs when the plan is
BUILT, operators composed on this primitive execute one aggregate
scan per tiling inside plan construction — a /analytics submit or
EXPLAIN of such an operator blocks for that scan before returning
(the same class as the engine's other plan-time-training operators:
the in-engine classifier, checkpointed dedups). The submit cache is
probed before the builder runs, so repeat submissions never re-pay
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: packing base: packed = sign*value * 10^13 + key. Keys must be
#: unique non-negative BIGINTs < 10^13 (TPC-H keys at SF 100 000 are
#: ~1.5·10¹⁰) and |value| < 8.5·10²⁴ so the product stays inside
#: DECIMAL(38,0); both are VERIFIED by the boundary job, not assumed.
_KEY_BASE = 10_000_000_000_000


def with_global_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n: int,
    out: str,
    descending: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """``df`` + column ``out`` = ntile(``n``) over the total order
    (``value_col`` ASC|DESC, ``key_col`` ASC). ``value_col`` and
    ``key_col`` must be integral; ``key_col`` unique and
    non-negative (the determinism contract). ``buckets`` defaults to
    the session's ``spark.sql.shuffle.partitions`` — scale it with
    the cluster, not the data."""
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    buckets = max(2, buckets)
    sign = -1 if descending else 1
    packed = (
        F.col(value_col).cast("decimal(38,0)") * F.lit(sign * _KEY_BASE)
        + F.col(key_col).cast("decimal(38,0)")
    )
    work = df.withColumn("_gt_packed", packed)
    # --- boundary phase: ONE aggregate job; results become literals
    probs = [i / buckets for i in range(1, buckets)]
    stats = work.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(value_col).alias("n_v"),
        F.count(key_col).alias("n_k"),
        F.expr(
            f"approx_percentile(CAST(_gt_packed AS DOUBLE), "
            f"array({', '.join(map(str, probs))}))"
        ).alias("bounds"),
        F.max(F.abs(F.col(value_col).cast("decimal(38,0)"))).alias("vmax"),
        F.min(F.col(key_col).cast("bigint")).alias("kmin"),
        F.max(F.col(key_col).cast("bigint")).alias("kmax"),
    ).collect()[0]
    total = stats["n"]
    if total == 0:
        return df.withColumn(out, F.lit(None).cast("int"))
    if stats["n_v"] != total or stats["n_k"] != total:
        raise ValueError(
            f"{value_col}/{key_col} must be non-NULL (the total-order "
            "contract NTILE determinism already requires; NULLS "
            "FIRST/LAST placement is not reproduced by the packing)"
        )
    if stats["kmin"] < 0 or stats["kmax"] >= _KEY_BASE:
        raise ValueError(
            f"{key_col} must be in [0, {_KEY_BASE}) for exact packing "
            f"(observed [{stats['kmin']}, {stats['kmax']}])"
        )
    if int(stats["vmax"]) * _KEY_BASE >= 10**38 // 2:
        raise ValueError(
            f"|{value_col}| too large to pack exactly "
            f"(max {stats['vmax']})"
        )
    bounds = sorted(set(stats["bounds"] or []))
    # --- assignment phase: all lazy, all parallel
    barr = "array(" + ", ".join(
        f"CAST({b!r} AS DOUBLE)" for b in bounds
    ) + ")"
    # bucket = number of boundaries <= this row's packed value —
    # monotone in the packed order by construction (the same DOUBLE
    # cast on both sides keeps the comparison consistent; ties that
    # collapse in DOUBLE land in the same bucket and re-order by the
    # EXACT packed value inside it)
    bucketed = work.withColumn(
        "_gt_bucket",
        F.expr(
            f"aggregate({barr}, 0, (acc, b) -> acc + CASE WHEN "
            f"CAST(_gt_packed AS DOUBLE) >= b THEN 1 ELSE 0 END)"
        ),
    )
    # --- offsets are eager LITERALS like the boundaries (one more
    # plan-build job): a lazy counts branch would be a second
    # consumer of the bucketed upstream, and column pruning rewrites
    # its exchange to carry fewer columns than the rank branch's, so
    # ReuseExchange never unifies them — each consumer re-evaluates
    # the whole upstream DAG, and a CHAINED tiling
    # (orders_rfm_segments stacks three) multiplies that into 2^k
    # upstream scans (measured: a 30× materialize blowup at sf0.1).
    # With literal offsets the returned plan is ONE branch: bucket →
    # rank-within-bucket → offset lookup. The cost moves to build
    # time, stated in the module docstring's cost-placement note.
    cnt_rows = bucketed.groupBy("_gt_bucket").agg(
        F.count(F.lit(1)).alias("c")
    ).collect()
    by_bucket = {r["_gt_bucket"]: r["c"] for r in cnt_rows}
    n_buckets = len(bounds) + 1
    offsets: list[int] = []
    acc = 0
    for b in range(n_buckets):
        offsets.append(acc)
        acc += by_bucket.get(b, 0)
    oarr = "array(" + ", ".join(
        f"CAST({o} AS BIGINT)" for o in offsets
    ) + ")"
    ranked = bucketed.withColumn(
        "_gt_rn",
        F.expr(f"element_at({oarr}, _gt_bucket + 1)")
        + F.expr(
            "row_number() OVER (PARTITION BY _gt_bucket "
            "ORDER BY _gt_packed)"
        ),
    )
    # SQL NTILE fill rule from the exact global rank: the first
    # N mod n tiles take base+1 rows, the rest take base (DIV keeps
    # the arithmetic in BIGINT)
    base, rem = total // n, total % n
    if base == 0:
        tile_expr = "_gt_rn"
    else:
        head = (base + 1) * rem
        tile_expr = (
            f"CASE WHEN _gt_rn <= {head} "
            f"THEN (_gt_rn - 1) DIV {base + 1} + 1 "
            f"ELSE {rem} + (_gt_rn - 1 - {head}) DIV {base} + 1 END"
        )
    return ranked.withColumn(out, F.expr(tile_expr).cast("int")).drop(
        "_gt_packed", "_gt_bucket", "_gt_rn"
    )
