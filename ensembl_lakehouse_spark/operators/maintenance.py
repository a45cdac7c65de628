"""Skew management and table-maintenance operators (EXT).

The reference never joins or mutates (read-only single-table surface,
app/main.py:479); at 100 TB both arrive immediately:

- **Salted join** — the standard counter to a hot join key. When the
  probe side has a key whose row count dwarfs the rest, hash
  partitioning sends the whole hot key to ONE task; AQE's skew-join
  split handles many cases, but the classic explicit fix — salt the
  big side, replicate the dim — is the tool when AQE can't (e.g.
  aggregation-after-join pinned to the same partitioning, or
  pre-AQE engines). The operator proves the rewrite is
  semantics-preserving: its oracle is the UNSALTED join.
- **Merge/upsert** — what Delta's MERGE INTO compiles to when the
  storage layer is plain parquet: full-outer join target↔source on
  the primary key, per-column coalesce, change-type tag. One
  sort-merge shuffle on the PK; at scale the source side is
  partition-pruned to touched partitions first (sources/layout.py
  carries that story).

Determinism: no aggregation over doubles except behind DECIMAL
casts; per-row double arithmetic (the simulated CDC price bump) is
identical IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.sources.tables import load_table

_DEC = "decimal(12,2)"

#: Salt fan-out: each (suppkey) key's rows spread over this many
#: sub-keys; the dim is replicated this many times. 8 splits a
#: straggler task 8× at the cost of an 8× dim dup — cheap when the
#: dim is thousands of times smaller than the fact.
SALT_BUCKETS = 8


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier via an explicitly SALTED fact⋈dim join.

    Rewrite: fact rows get ``salt = pmod(l_orderkey, S)`` (any
    deterministic spreader works — crucially NOT derived from the
    join key, so a hot suppkey's rows land in S different
    partitions); the supplier dim is exploded ×S with every salt
    value. The join key becomes (suppkey, salt): a key that was one
    straggler task is now S parallel tasks.

    The aggregation then re-groups by supplier only, which Spark
    runs as partial aggs on the salted partitioning followed by one
    tiny final shuffle — so the hot key's work stays split end-to-
    end. Oracle = the plain unsalted join+agg: bit-equal results
    prove the rewrite preserves semantics.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    salted_fact = li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)))
    salted_dim = supp.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    ).withColumn("salt", F.col("salt").cast("bigint"))
    revenue = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    )
    return (
        salted_fact.join(
            salted_dim,
            on=[
                salted_fact.l_suppkey == salted_dim.s_suppkey,
                salted_fact.salt == salted_dim.salt,
            ],
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("s_suppkey")
    )


JOIN_SKEW_SALTED_SQL = """
SELECT s_suppkey, s_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
"""


#: Simulated CDC feed: every 10th order gets a price/status update,
#: every 100th≡7 order arrives as a brand-new row (key offset far
#: above the existing keyspace).
_UPDATE_MOD = 10
_INSERT_MOD = 100
_INSERT_REM = 7
_INSERT_KEY_OFFSET = 1_000_000_000


def _cdc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.where(F.col("o_orderkey") % _UPDATE_MOD == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        )
    )
    inserts = (
        orders.where(F.col("o_orderkey") % _INSERT_MOD == _INSERT_REM)
        .select(
            (F.col("o_orderkey") + F.lit(_INSERT_KEY_OFFSET)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.col("o_totalprice"),
        )
    )
    return updates.unionByName(inserts)


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders USING cdc ON o_orderkey — as a plain-
    parquet engine runs it: one full-outer sort-merge join on the
    PK, per-column COALESCE(source, target), and a change tag
    (U=updated, I=inserted, K=kept) so downstream audit is free.

    WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT — the
    full-outer + coalesce IS those clauses, declaratively; Delta's
    MERGE compiles to this same join under the hood. Scale: both
    sides shuffle once on o_orderkey; with a partitioned target the
    join is preceded by partition pruning to the touched set.
    """
    target = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    source = _cdc_source(spark, sf_dir)
    t, s = target.alias("t"), source.alias("s")
    return (
        t.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("s.o_orderstatus"), F.col("t.o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.coalesce(F.col("s.o_totalprice"), F.col("t.o_totalprice")).alias(
                "o_totalprice"
            ),
            F.when(
                F.col("s.o_orderkey").isNotNull() & F.col("t.o_orderkey").isNotNull(),
                F.lit("U"),
            )
            .when(F.col("t.o_orderkey").isNull(), F.lit("I"))
            .otherwise(F.lit("K"))
            .alias("change_type"),
        )
    )


#: Split of the event stream into "already ingested" base vs the
#: late-arriving delta batch (deterministic, disjoint, complete).
_DELTA_MOD = 10
_DELTA_REM = 7


def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for the hourly rollup: the
    materialized base aggregate (events except the delta slice) is
    UPDATED with the late batch's partial aggregate — full-outer
    merge on the group key, counts added, sums added — instead of
    recomputing from all history.

    This is how continuous aggregates stay O(delta) at 100 TB: the
    base is |groups| rows, the delta aggregate is |delta| rows
    reduced before the merge, and history is never re-scanned. The
    oracle recomputes the rollup from scratch over ALL events —
    equality proves the merge algebra (count/sum are mergeable;
    avg/derived metrics must be re-derived from merged sums, which
    this does) is exactly lossless.

    Decimal fixed-point sums keep the merged totals bit-identical
    to the recomputed ones in both engines.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("value").cast(_DEC).alias("v"),
    )
    is_delta = F.col("event_id") % _DELTA_MOD == _DELTA_REM

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("hour", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("sum_v")
        )

    base = rollup(events.where(~is_delta))
    delta = rollup(events.where(is_delta))
    b, d = base.alias("b"), delta.alias("d")
    merged = (
        b.join(
            d,
            (F.col("b.hour") == F.col("d.hour"))
            & (F.col("b.event_type") == F.col("d.event_type")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("b.hour"), F.col("d.hour")).alias("hour"),
            F.coalesce(F.col("b.event_type"), F.col("d.event_type")).alias("event_type"),
            (
                F.coalesce(F.col("b.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("b.sum_v"), F.lit(0).cast(_DEC))
                + F.coalesce(F.col("d.sum_v"), F.lit(0).cast(_DEC))
            ).alias("sum_v"),
        )
    )
    return merged.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        F.col("sum_v").cast("double").alias("sum_value"),
        (F.col("sum_v").cast("double") / F.col("n_events")).alias("avg_value"),
    ).orderBy("hour", "event_type")


ROLLUP_INCREMENTAL_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour, event_type
"""


MERGE_UPSERT_SQL = f"""
WITH src AS (
  SELECT o_orderkey, 'P' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
  FROM orders WHERE o_orderkey % {_UPDATE_MOD} = 0
  UNION ALL
  SELECT o_orderkey + {_INSERT_KEY_OFFSET}, 'N', o_totalprice
  FROM orders WHERE o_orderkey % {_INSERT_MOD} = {_INSERT_REM}
)
SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
       COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
       CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL THEN 'U'
            WHEN t.o_orderkey IS NULL THEN 'I'
            ELSE 'K' END AS change_type
FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) t
FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
"""


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build
# ---------------------------------------------------------------------------

def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: collapse each user's
    event-type history into validity intervals — one row per state
    *change*, carrying [valid_from, valid_to) and a version number,
    open-ended on the current state. The standard dimension-table
    derivation every warehouse load runs over a CDC/event feed.

    Two window passes over the same (user_id → ts, event_id)
    ordering: lag() marks change rows (consecutive-duplicate
    collapse), then lead() over the surviving rows closes each
    interval. Catalyst evaluates both in one shuffle on user_id —
    the second window reuses the first's partitioning and sort.

    Validity bounds are epoch MICROSECONDS (exact integers in both
    engines — no timestamp-format round-trip). Bounded to
    user_id ≤ 50 for the contract result; the plan is
    user-count-independent. At 100 TB per-user history length is
    the only memory knob (window buffers one user's rows).
    """
    events = load_table(spark, sf_dir, "events")
    w = "(PARTITION BY user_id ORDER BY ts, event_id)"
    changes = (
        events.where(F.col("user_id") <= 50)
        .select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            # ts is TIMESTAMP_NTZ (unix_micros rejects it) — diff
            # against the epoch instead, same exact integer
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
            F.expr(f"lag(event_type) OVER {w}").alias("prev_state"),
        )
        .where(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
    )
    w2 = "(PARTITION BY user_id ORDER BY ts_us, event_id)"
    return changes.select(
        "user_id",
        "state",
        F.col("ts_us").alias("valid_from_us"),
        F.expr(f"lead(ts_us) OVER {w2}").alias("valid_to_us"),
        F.expr(f"row_number() OVER {w2}").alias("version"),
        F.expr(f"lead(ts_us) OVER {w2} IS NULL").alias("is_current"),
    ).orderBy("user_id", "version")


SCD2_INTERVALS_SQL = """
WITH c AS (
  SELECT user_id, event_id, event_type AS state,
         epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state
  FROM events WHERE user_id <= 50
), k AS (
  SELECT user_id, state, ts_us, event_id FROM c
  WHERE prev_state IS NULL OR state != prev_state
)
SELECT user_id, state,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w AS valid_to_us,
       row_number() OVER w AS version,
       lead(ts_us) OVER w IS NULL AS is_current
FROM k
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, version
"""


#: Foreign-key edges of the fixture star/snowflake schema:
#: (edge label, child table, child key, parent table, parent key).
FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
)


def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every FK edge of the schema,
    the child row count and the orphan count (child keys with no
    parent) — the data-quality sweep a lakehouse runs after every
    load, and the operator that catches a broken upstream export
    before queries silently inner-join rows away.

    Plan: one left-anti join per edge (the anti side carries ONLY
    the parent key column; bounded parents broadcast, fact-sized
    parents shuffle — both left to AQE), each reduced to a 1-row
    count before the 8-row union. Cost is one scan per table per
    role, embarrassingly parallel across edges; at 100 TB the same
    audit is the canary job, scans shared via caching if desired.
    """
    out = None
    for label, child, ck, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        edge = (
            c.join(p, "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("orphan_rows"))
            .crossJoin(c.agg(F.count(F.lit(1)).alias("child_rows")))
            .select(
                F.lit(label).alias("fk_edge"),
                "child_rows",
                "orphan_rows",
            )
        )
        out = edge if out is None else out.unionByName(edge)
    return out.orderBy("fk_edge")


AUDIT_REFERENTIAL_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS fk_edge,
       (SELECT COUNT(*) FROM {child}) AS child_rows,
       (SELECT COUNT(*) FROM {child}
        WHERE NOT EXISTS (SELECT 1 FROM {parent} WHERE {parent}.{pk} = {child}.{ck}))
         AS orphan_rows"""
    for label, child, ck, parent, pk in FK_EDGES
) + "\nORDER BY fk_edge"
