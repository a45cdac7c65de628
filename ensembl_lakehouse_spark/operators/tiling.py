"""Exact global NTILE without a single-partition window — the
two-phase boundary-broadcast tiling primitive (r8 VERDICT #4).

``ntile(n) OVER (ORDER BY v, k)`` is the one plan shape in the
operator library that funnels an SF-growing relation through ONE
task: Spark plans a global window as ``Exchange SinglePartition →
Window``, so at TPC-H 100× a ~10⁹-row supplier/customer tiling
serializes on a single executor core no matter how wide the cluster
is. This module replaces it with the classic two-phase formulation
every MPP engine uses for global ranking:

1. **Boundary + offset phase (TWO eager full-input jobs at
   plan-build time — for ALL requested tilings together, r9 VERDICT
   #3: the r9 shape paid two jobs PER tiling, so a chained RFM
   scored six scans inside plan construction)**: each ordering tuple
   ``(value, key)`` is packed into one monotone DECIMAL(38,0)
   (``key`` must be a unique BIGINT — the same total-order
   requirement NTILE determinism already imposes); ONE aggregate
   collects ``approx_percentile`` bucket boundaries for every spec
   side by side (plus the exact row count and the packing-safety
   maxima), then ONE exploded count job folds per-(spec, bucket) row
   counts into cumulative offsets. BOTH results become literals in
   the returned plan. Eager is load-bearing twice over:
   approx_percentile's merge order is not guaranteed deterministic
   (two independent lazy evaluations could bucket differently and
   corrupt the offsets), and a lazy counts branch would be a second
   consumer of the upstream whose column-pruned exchange never
   unifies with the rank branch's under ReuseExchange — each
   consumer re-evaluates the whole upstream DAG, which a chained
   tiling compounds into 2^k scans.
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
the same total order — the DuckDB oracles for the consumers
(supplier_balance_deciles, orders_rfm_segments,
customer_balance_spend_matrix, customer_spend_lorenz) keep their
plain-SQL ntile form.

Boundary-quality note: approx_percentile boundaries only balance
LOAD; correctness never depends on them. A pathological sketch
would skew bucket sizes, not answers.

Cost placement note: because the boundary job runs when the plan is
BUILT, operators composed on this primitive execute the two
aggregate scans inside plan construction — a /analytics submit or
EXPLAIN of such an operator blocks for that scan before returning
(the same class as the engine's other plan-time-training operators:
the in-engine classifier, checkpointed dedups). Two mitigations
(r9 VERDICT #3): all of an operator's tilings share the two jobs
(``with_global_ntiles``), and an operator that names itself via
``cache_ns`` gets its boundary/offset LITERALS memoized per process
keyed on the input-file fingerprint (path, mtime, size of every
leaf file) — repeat plan builds over unchanged data pay zero jobs.
The fingerprint covers the LEAF FILES, not the lineage in between,
so ``cache_ns`` must uniquely name the transformation feeding the
tiling (one namespace per operator); two different lattices over
the same files must not share a namespace.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, functions as F

#: packing base: packed = sign*value * 10^13 + key. Keys must be
#: unique non-negative BIGINTs < 10^13 (TPC-H keys at SF 100 000 are
#: ~1.5·10¹⁰) and |value| < 8.5·10²⁴ so the product stays inside
#: DECIMAL(38,0); both are VERIFIED by the boundary job, not assumed.
_KEY_BASE = 10_000_000_000_000

#: process-lifetime literal memo: (cache_ns, fingerprint, buckets,
#: specs) -> {"total", "bounds": per-spec, "offsets": per-spec}.
#: Bounded: oldest insertion evicted past the cap (the literal sets
#: are tiny — B doubles + B longs per spec — the cap guards against
#: an unbounded namespace, not memory pressure).
_LITERAL_CACHE: dict[tuple, dict] = {}
_CACHE_CAP = 128


def _input_fingerprint(df: DataFrame) -> tuple | None:
    """(path, mtime_ns, size) of every local leaf file feeding
    ``df``, or None when any file is non-local/unlistable — callers
    then skip caching rather than risk serving stale literals.
    Metadata-only (Spark's FileIndex + os.stat), zero jobs."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    items = []
    for f in sorted(files):
        if f.startswith("file:"):
            p = unquote(urlparse(f).path)
        elif "://" in f:
            return None
        else:
            p = f
        try:
            st = os.stat(p)
        except OSError:
            return None
        items.append((p, st.st_mtime_ns, st.st_size))
    return tuple(items)


def with_global_ntiles(
    df: DataFrame,
    specs: list[tuple[str, str, int, str, bool]],
    buckets: int | None = None,
    cache_ns: str | None = None,
) -> DataFrame:
    """``df`` + one NTILE column per spec ``(value_col, key_col, n,
    out, descending)``: ``out`` = ntile(``n``) over the total order
    (``value_col`` ASC|DESC, ``key_col`` ASC). Columns must be
    integral; ``key_col`` unique and non-negative (the determinism
    contract). ``buckets`` defaults to the session's
    ``spark.sql.shuffle.partitions`` — scale it with the cluster,
    not the data. All specs share the two plan-build jobs;
    ``cache_ns`` (an operator-unique name) additionally memoizes the
    boundary/offset literals per process, keyed on the input-file
    fingerprint."""
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    buckets = max(2, buckets)
    work = df
    for i, (value_col, key_col, _, _, descending) in enumerate(specs):
        sign = -1 if descending else 1
        work = work.withColumn(
            f"_gt_packed{i}",
            F.col(value_col).cast("decimal(38,0)")
            * F.lit(sign * _KEY_BASE)
            + F.col(key_col).cast("decimal(38,0)"),
        )

    cache_key = None
    lit = None
    if cache_ns is not None:
        fp = _input_fingerprint(df)
        if fp is not None:
            cache_key = (cache_ns, fp, buckets, tuple(specs))
            lit = _LITERAL_CACHE.get(cache_key)

    if lit is None:
        # --- boundary phase: ONE aggregate job for every spec;
        # results become literals
        probs = [i / buckets for i in range(1, buckets)]
        parr = ", ".join(map(str, probs))
        aggs = [F.count(F.lit(1)).alias("n")]
        for i, (value_col, key_col, _, _, _) in enumerate(specs):
            aggs += [
                F.count(value_col).alias(f"n_v{i}"),
                F.count(key_col).alias(f"n_k{i}"),
                F.expr(
                    f"approx_percentile(CAST(_gt_packed{i} AS DOUBLE), "
                    f"array({parr}))"
                ).alias(f"bounds{i}"),
                F.max(
                    F.abs(F.col(value_col).cast("decimal(38,0)"))
                ).alias(f"vmax{i}"),
                F.min(F.col(key_col).cast("bigint")).alias(f"kmin{i}"),
                F.max(F.col(key_col).cast("bigint")).alias(f"kmax{i}"),
            ]
        stats = work.agg(*aggs).collect()[0]
        total = stats["n"]
        if total == 0:
            out_df = df
            for _, _, _, out, _ in specs:
                out_df = out_df.withColumn(out, F.lit(None).cast("int"))
            return out_df
        bounds_by_spec: list[list[float]] = []
        for i, (value_col, key_col, _, _, _) in enumerate(specs):
            if stats[f"n_v{i}"] != total or stats[f"n_k{i}"] != total:
                raise ValueError(
                    f"{value_col}/{key_col} must be non-NULL (the "
                    "total-order contract NTILE determinism already "
                    "requires; NULLS FIRST/LAST placement is not "
                    "reproduced by the packing)"
                )
            if stats[f"kmin{i}"] < 0 or stats[f"kmax{i}"] >= _KEY_BASE:
                raise ValueError(
                    f"{key_col} must be in [0, {_KEY_BASE}) for exact "
                    f"packing (observed [{stats[f'kmin{i}']}, "
                    f"{stats[f'kmax{i}']}])"
                )
            if int(stats[f"vmax{i}"]) * _KEY_BASE >= 10**38 // 2:
                raise ValueError(
                    f"|{value_col}| too large to pack exactly "
                    f"(max {stats[f'vmax{i}']})"
                )
            bounds_by_spec.append(sorted(set(stats[f"bounds{i}"] or [])))
        # --- offsets are eager LITERALS like the boundaries (one
        # more plan-build job — shared by all specs via a 3-row-wide
        # explode whose partial agg reduces to ≤ specs·B rows before
        # the exchange): a lazy counts branch would be a second
        # consumer of the bucketed upstream, and column pruning
        # rewrites its exchange to carry fewer columns than the rank
        # branch's, so ReuseExchange never unifies them — each
        # consumer re-evaluates the whole upstream DAG, and a
        # CHAINED tiling (orders_rfm_segments stacks three)
        # multiplies that into 2^k upstream scans (measured: a 30×
        # materialize blowup at sf0.1). With literal offsets the
        # returned plan is ONE branch per spec: bucket →
        # rank-within-bucket → offset lookup.
        pair_structs = []
        counted = work
        for i in range(len(specs)):
            counted = counted.withColumn(
                f"_gt_b{i}", _bucket_expr(i, bounds_by_spec[i])
            )
            pair_structs.append(
                F.struct(
                    F.lit(i).alias("s"), F.col(f"_gt_b{i}").alias("b")
                )
            )
        cnt_rows = (
            counted.select(F.explode(F.array(*pair_structs)).alias("p"))
            .groupBy("p.s", "p.b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_spec_bucket: dict[tuple[int, int], int] = {
            (r["s"], r["b"]): r["c"] for r in cnt_rows
        }
        offsets_by_spec: list[list[int]] = []
        for i in range(len(specs)):
            n_buckets = len(bounds_by_spec[i]) + 1
            offsets: list[int] = []
            acc = 0
            for b in range(n_buckets):
                offsets.append(acc)
                acc += by_spec_bucket.get((i, b), 0)
            offsets_by_spec.append(offsets)
        lit = {
            "total": total,
            "bounds": bounds_by_spec,
            "offsets": offsets_by_spec,
        }
        if cache_key is not None:
            if len(_LITERAL_CACHE) >= _CACHE_CAP:
                _LITERAL_CACHE.pop(next(iter(_LITERAL_CACHE)))
            _LITERAL_CACHE[cache_key] = lit

    total = lit["total"]
    # --- assignment phase: all lazy, all parallel, one branch
    out_df = work
    drop = []
    for i, (_, _, n, out, _) in enumerate(specs):
        out_df = out_df.withColumn(
            f"_gt_b{i}", _bucket_expr(i, lit["bounds"][i])
        )
        oarr = "array(" + ", ".join(
            f"CAST({o} AS BIGINT)" for o in lit["offsets"][i]
        ) + ")"
        out_df = out_df.withColumn(
            f"_gt_rn{i}",
            F.expr(f"element_at({oarr}, _gt_b{i} + 1)")
            + F.expr(
                f"row_number() OVER (PARTITION BY _gt_b{i} "
                f"ORDER BY _gt_packed{i})"
            ),
        )
        # SQL NTILE fill rule from the exact global rank: the first
        # N mod n tiles take base+1 rows, the rest take base (DIV
        # keeps the arithmetic in BIGINT)
        base, rem = total // n, total % n
        if base == 0:
            tile_expr = f"_gt_rn{i}"
        else:
            head = (base + 1) * rem
            tile_expr = (
                f"CASE WHEN _gt_rn{i} <= {head} "
                f"THEN (_gt_rn{i} - 1) DIV {base + 1} + 1 "
                f"ELSE {rem} + (_gt_rn{i} - 1 - {head}) DIV {base} + 1 "
                "END"
            )
        out_df = out_df.withColumn(out, F.expr(tile_expr).cast("int"))
        drop += [f"_gt_packed{i}", f"_gt_b{i}", f"_gt_rn{i}"]
    return out_df.drop(*drop)


def _bucket_expr(i: int, bounds: list[float]):
    """bucket = number of boundaries <= this row's packed value —
    monotone in the packed order by construction (the same DOUBLE
    cast on both sides keeps the comparison consistent; ties that
    collapse in DOUBLE land in the same bucket and re-order by the
    EXACT packed value inside it)."""
    barr = "array(" + ", ".join(
        f"CAST({b!r} AS DOUBLE)" for b in bounds
    ) + ")"
    return F.expr(
        f"aggregate({barr}, 0, (acc, b) -> acc + CASE WHEN "
        f"CAST(_gt_packed{i} AS DOUBLE) >= b THEN 1 ELSE 0 END)"
    )


def with_global_ntile(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n: int,
    out: str,
    descending: bool = False,
    buckets: int | None = None,
    cache_ns: str | None = None,
) -> DataFrame:
    """Single-spec convenience over :func:`with_global_ntiles`."""
    return with_global_ntiles(
        df,
        [(value_col, key_col, n, out, descending)],
        buckets=buckets,
        cache_ns=cache_ns,
    )
