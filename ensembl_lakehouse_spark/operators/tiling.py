"""Exact global NTILE without a single-partition window — the
two-phase boundary-broadcast tiling primitive (r8 VERDICT #4).

``ntile(n) OVER (ORDER BY v, k)`` is the one plan shape in the
operator library that funnels an SF-growing relation through ONE
task: Spark plans a global window as ``Exchange SinglePartition →
Window``, so at TPC-H 100× a ~10⁹-row supplier/customer tiling
serializes on a single executor core no matter how wide the cluster
is. This module replaces it with the classic two-phase formulation
every MPP engine uses for global ranking:

1. **Boundary + offset phase (eager full-input jobs at plan-build
   time — for ALL requested tilings together, r9 VERDICT #3: the r9
   shape paid two jobs PER tiling, so a chained RFM scored six scans
   inside plan construction)**: each ordering tuple ``(value, key)``
   is packed into one monotone DECIMAL(38,0) (``key`` must be a
   unique BIGINT — the same total-order requirement NTILE
   determinism already imposes); ONE aggregate collects
   ``approx_percentile`` bucket boundaries for every spec side by
   side (plus the exact row count and the packing-safety maxima),
   then ONE exploded count job folds per-(spec, bucket) row counts
   into cumulative offsets, and ONE selection job extracts the EXACT
   packed value at each of the ``n-1`` NTILE boundary ranks (the
   fill-rule cutoffs — the offsets locate each cutoff's bucket, a
   per-bucket ``row_number`` window over ONLY the cutoff buckets
   finds the value; ≤ specs·(n-1) rows come back). The cutoffs
   become literals in the returned plan. Eager is load-bearing twice
   over: approx_percentile's merge order is not guaranteed
   deterministic (two independent lazy evaluations could bucket
   differently and corrupt the offsets), and a lazy counts branch
   would be a second consumer of the upstream whose column-pruned
   exchange never unifies with the rank branch's under
   ReuseExchange — each consumer re-evaluates the whole upstream
   DAG, which a chained tiling compounds into 2^k scans.
2. **Assignment phase (fully lazy, map-only, zero exchanges — r10
   VERDICT #3)**: a row's tile is ``1 + #{cutoffs < packed}`` over
   the broadcast O(n) cutoff literals, compared in exact
   DECIMAL(38,0). No per-bucket ``row_number`` window survives into
   the returned plan, so a chained tiling (the RFM stacks three)
   adds ZERO exchanges to the consumer — the r10 shape paid one
   full-lattice exchange per spec, ~0.4 s of pure stage overhead
   each at sf0.1 and a per-spec lattice shuffle at cluster scale.

Why ``1 + #{cutoffs < packed}`` is bit-identical to SQL NTILE: let
``R_t`` be the cumulative row count through tile ``t`` under the
fill rule (first ``N mod n`` tiles take one extra row) and let the
cutoff list hold the packed value at rank ``R_t`` for each
``t = 1..n-1`` (WITH multiplicity — when ``n > N`` several ``R_t``
coincide and the repeated value must count repeatedly). Packed
values are unique (unique-key packing), so for a row of global rank
``k`` in tile ``t*``: ``cutoff_t < packed  ⇔  R_t < k``, which holds
exactly for ``t < t*`` — the count is ``t* - 1``. The DuckDB oracles
for the consumers (supplier_balance_deciles, orders_rfm_segments,
customer_balance_spend_matrix, customer_spend_lorenz) keep their
plain-SQL ntile form.

Boundary-quality note: approx_percentile boundaries only balance
LOAD; correctness never depends on them. A pathological sketch
would skew bucket sizes, not answers.

Cost placement note: because the boundary job runs when the plan is
BUILT, operators composed on this primitive execute the three
plan-build scans inside plan construction — a /analytics submit or
EXPLAIN of such an operator blocks for that scan before returning
(the same class as the engine's other plan-time-training operators:
the in-engine classifier, checkpointed dedups). Two mitigations
(r9 VERDICT #3): all of an operator's tilings share the plan-build
jobs (``with_global_ntiles``), and an operator that names itself via
``cache_ns`` gets its cutoff LITERALS memoized per process
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
    # one withColumns call, not a per-spec withColumn loop: every
    # DataFrame API call re-analyzes the (pre-checkpoint) plan in the
    # JVM — batching the packing/bucket/assignment loops removed
    # ~0.4 s of py4j/analysis time per build at sf0.1
    work = df.withColumns(
        {
            f"_gt_packed{i}": F.col(value_col).cast("decimal(38,0)")
            * F.lit((-1 if descending else 1) * _KEY_BASE)
            + F.col(key_col).cast("decimal(38,0)")
            for i, (value_col, key_col, _, _, descending) in enumerate(specs)
        }
    )

    cache_key = None
    lit = None
    if cache_ns is not None:
        fp = _input_fingerprint(df)
        if fp is not None:
            cache_key = (cache_ns, fp, buckets, tuple(specs))
            lit = _LITERAL_CACHE.get(cache_key)

    if lit is None:
        # --- materialize the packed lattice ONCE (r12, guide §3.3).
        # The boundary/offset/selection jobs below plus the returned
        # consumer plan are FOUR independent evaluations of ``work``
        # — and ``work`` is usually itself an aggregation of a fact
        # table, so each job re-ran the upstream scan+shuffle from
        # the base tables (orders_rfm_segments: 5.6 s of plan-build
        # at sf0.1, ~4 upstream evals). One localCheckpoint makes it
        # one evaluation; the three jobs and the consumer read the
        # materialized |keys|-row lattice (measured 5.6→0.9 s build).
        # Values are integral decimals — merge-order deterministic —
        # and the warm cache_ns path (lit cached) stays lazy and
        # untouched.
        work = work.localCheckpoint()
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
        # hoist the decimal→double cast out of the bucket expression:
        # it was re-evaluated per BOUND per row (measured: the counts
        # job dropped 1.5→0.4 s at sf0.1); two batched withColumns
        # (the _gt_b exprs read the _gt_d columns, so they cannot
        # share one call) instead of a per-spec loop
        counted = work.withColumns(
            {
                f"_gt_d{i}": F.col(f"_gt_packed{i}").cast("double")
                for i in range(len(specs))
            }
        ).withColumns(
            {
                f"_gt_b{i}": _bucket_expr(i, bounds_by_spec[i])
                for i in range(len(specs))
            }
        )
        pair_structs = [
            F.struct(F.lit(i).alias("s"), F.col(f"_gt_b{i}").alias("b"))
            for i in range(len(specs))
        ]
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
        # --- selection job: the EXACT packed value at each NTILE
        # boundary rank (one more plan-build job, shared by all
        # specs). The offsets locate each cutoff's bucket, so the
        # per-bucket row_number window here runs over ONLY the
        # ≤ specs·(n-1) cutoff buckets (~n/B of the lattice) and the
        # collect returns exactly one row per distinct (spec,
        # bucket, rank) target. Trading this third plan-build pass
        # for the assignment windows removes one full-lattice
        # exchange PER SPEC from every consumer's executed plan
        # (r10 VERDICT #3).
        import bisect

        targets_by_spec: list[list[tuple[int, int]]] = []
        for i, (_, _, n, _, _) in enumerate(specs):
            base, rem = total // n, total % n
            offs = offsets_by_spec[i]
            targets: list[tuple[int, int]] = []
            for t in range(1, n):
                full = min(t, rem)
                r_t = (base + 1) * full + base * (t - full)
                if r_t == 0 or r_t > total:
                    # base == 0 ⇒ rem == total ⇒ r_t = min(t, total)
                    # ∈ [1, total]; guarded anyway
                    r_t = min(max(r_t, 1), total)
                b = bisect.bisect_left(offs, r_t) - 1
                targets.append((b, r_t - offs[b]))
            targets_by_spec.append(targets)
        need = {
            (i, b, rn)
            for i, targets in enumerate(targets_by_spec)
            for (b, rn) in targets
        }
        val_by: dict[tuple[int, int, int], str] = {}
        if need:
            from pyspark.sql.window import Window

            sel_structs = [
                F.struct(
                    F.lit(i).alias("s"),
                    F.col(f"_gt_b{i}").alias("b"),
                    F.col(f"_gt_packed{i}").alias("p"),
                )
                for i in range(len(specs))
            ]
            bucket_cond = None
            for i, targets in enumerate(targets_by_spec):
                bset = sorted({b for (b, _) in targets})
                if not bset:
                    continue
                c = (F.col("s") == i) & F.col("b").isin(bset)
                bucket_cond = c if bucket_cond is None else bucket_cond | c
            rank_cond = None
            by_sb: dict[tuple[int, int], set] = {}
            for i, b, rn in need:
                by_sb.setdefault((i, b), set()).add(rn)
            for (i, b), rns in by_sb.items():
                c = (
                    (F.col("s") == i)
                    & (F.col("b") == b)
                    & F.col("rn").isin(sorted(rns))
                )
                rank_cond = c if rank_cond is None else rank_cond | c
            rows = (
                counted.select(
                    F.explode(F.array(*sel_structs)).alias("q")
                )
                .select("q.s", "q.b", "q.p")
                .where(bucket_cond)
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("s", "b").orderBy("p")
                    ),
                )
                .where(rank_cond)
                .collect()
            )
            val_by = {(r["s"], r["b"], r["rn"]): str(r["p"]) for r in rows}
            if len(val_by) != len(need):
                raise RuntimeError(
                    f"NTILE cutoff selection returned {len(val_by)} of "
                    f"{len(need)} boundary values — bucket/offset "
                    "literals are inconsistent; refusing to tile"
                )
        cutoffs_by_spec: list[list[str]] = [
            [val_by[(i, b, rn)] for (b, rn) in targets]
            for i, targets in enumerate(targets_by_spec)
        ]
        lit = {"total": total, "cutoffs": cutoffs_by_spec}
        if cache_key is not None:
            if len(_LITERAL_CACHE) >= _CACHE_CAP:
                _LITERAL_CACHE.pop(next(iter(_LITERAL_CACHE)))
            _LITERAL_CACHE[cache_key] = lit

    # --- assignment phase: map-only, zero exchanges. tile =
    # 1 + #{cutoffs < packed}, counted over the broadcast literal
    # cutoff list in exact DECIMAL(38,0) (multiplicity matters when
    # n > N: coincident boundary ranks repeat the same value and
    # each repetition advances the tile — that IS the fill rule;
    # correctness argument in the module docstring). O(n) per row —
    # n is the tile count (4/10 for every consumer), not the data.
    # Flat CASE-sum, not an aggregate() HOF (r12): lambda HOFs are
    # interpreted per element and block whole-stage codegen in every
    # consumer's executed plan; the flat form codegens and sidesteps
    # the filter()-lambda NoSuchElementException this comment block
    # used to work around (plan deduplication over exceptAll /
    # self-joins of the tiled output). Exact DECIMAL(38,0) compares,
    # same count, bit-identical tile.
    assigns = {}
    for i, (_, _, n, out, _) in enumerate(specs):
        cuts = lit["cutoffs"][i]
        if not cuts:
            assigns[out] = F.lit(1).cast("int")
        elif len(cuts) <= _FLAT_SUM_CAP:
            terms = _sum_tree(
                [
                    f"(CASE WHEN CAST('{c}' AS DECIMAL(38,0)) "
                    f"< _gt_packed{i} THEN 1 ELSE 0 END)"
                    for c in cuts
                ]
            )
            assigns[out] = (F.lit(1) + F.expr(terms)).cast("int")
        else:
            # huge tile counts: the flat Add tree overflows the
            # optimizer's recursive flattenAdd (StackOverflow at
            # n=5000); the O(n)-per-row interpreted HOF is the safe
            # form there. aggregate(), not size(filter()): a filter()
            # lambda capturing an outer column trips a
            # NoSuchElementException in this Spark build's plan
            # deduplication (exceptAll / self-join over the tiled
            # output); the aggregate() form survives it.
            carr = "array(" + ", ".join(
                f"CAST('{c}' AS DECIMAL(38,0))" for c in cuts
            ) + ")"
            assigns[out] = (
                F.lit(1)
                + F.expr(
                    f"aggregate({carr}, 0, (acc, c) -> acc + "
                    f"CASE WHEN c < _gt_packed{i} THEN 1 ELSE 0 END)"
                )
            ).cast("int")
    return work.withColumns(assigns).drop(
        *[f"_gt_packed{i}" for i in range(len(specs))]
    )


#: max CASE terms in a flat codegen-able sum; past this the Add tree
#: risks the optimizer's recursive flattenAdd (StackOverflow measured
#: at ~5000 terms) and callers fall back to an aggregate() HOF.
_FLAT_SUM_CAP = 256


def _sum_tree(terms: list[str]) -> str:
    """Sum of the term expressions as a BALANCED parenthesized tree:
    a flat ``a + b + ...`` chain of ~1000 terms exceeds the SQL
    parser's recursion budget ([FAILED_TO_PARSE_TOO_COMPLEX]); 8-ary
    grouping keeps depth logarithmic with identical integer sums."""
    while len(terms) > 1:
        terms = [
            "(" + " + ".join(terms[j : j + 8]) + ")"
            for j in range(0, len(terms), 8)
        ]
    return terms[0]


def _bucket_expr(i: int, bounds: list[float]):
    """bucket = number of boundaries <= this row's packed value —
    monotone in the packed order by construction (the same DOUBLE
    cast on both sides keeps the comparison consistent; ties that
    collapse in DOUBLE land in the same bucket and re-order by the
    EXACT packed value inside it). Reads the hoisted ``_gt_d{i}``
    double column (cast once per row, not per array element — the
    HOF lambda is interpreted, guide §1.2 per-task work).

    Codegen-able sum of CASEs, not an ``aggregate()`` HOF: lambda
    HOFs are evaluated by the Catalyst interpreter per element, and
    the AQE-coalesced lattice runs them on ONE task — measured
    ~1.2 s per plan-build job at sf0.1 for 15k rows × 3 specs × 63
    bounds; the flat expression whole-stage-codegens to straight-line
    comparisons (same integer count, bit-identical bucket). Built as
    ONE SQL string: a Python loop of Column ``+``/``when`` ops costs
    ~2·B py4j round trips per spec (~1.9 s of plan-build at B=64 ×
    3 specs); one ``F.expr`` parse is a single call."""
    if not bounds:
        return F.lit(0)
    if len(bounds) > _FLAT_SUM_CAP:
        barr = "array(" + ", ".join(
            f"CAST({b!r} AS DOUBLE)" for b in bounds
        ) + ")"
        return F.expr(
            f"aggregate({barr}, 0, (acc, b) -> acc + CASE WHEN "
            f"_gt_d{i} >= b THEN 1 ELSE 0 END)"
        )
    return F.expr(
        _sum_tree(
            [
                f"(CASE WHEN _gt_d{i} >= CAST({b!r} AS DOUBLE) "
                "THEN 1 ELSE 0 END)"
                for b in bounds
            ]
        )
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
