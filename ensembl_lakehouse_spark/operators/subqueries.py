"""Decorrelated-subquery operators (EXT, SURVEY §2 joins/agg family).

The reference's surface has no subqueries (single-table
SELECT-project-filter, app/main.py:479), but every analyst using it
through Athena writes them; these are the three canonical TPC-H
subquery shapes, each expressed the way a Spark engine should run
them at 100 TB — *decorrelated by construction* rather than trusting
a rewriter to unnest a correlated scalar subquery:

- Q17 shape: correlated scalar aggregate (``l_quantity <
  (SELECT 0.2*avg(..) WHERE same partkey)``) → pre-aggregate the
  inner ONCE per key, join the thresholds back. The pre-agg output
  is |part| rows — broadcastable at any SF where part fits, and the
  scan of lineitem happens exactly twice (once to build thresholds,
  once to probe), never per-outer-row.
- Q13 shape: COUNT over a LEFT OUTER join, keeping the zero groups
  the inner join would drop, then a second tiny histogram agg.
- Q4 shape: EXISTS → LEFT SEMI join, aggregated after the semi —
  the semi join never materializes match multiplicity, so the
  shuffle carries each orders row at most once regardless of how
  many lineitems match.

Determinism: quantities are integral doubles (1..50) so their
DECIMAL casts are lossless; all sums are decimal fixed-point per the
module rule in operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

_DEC = "decimal(12,2)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def scalar_subquery_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, widened to all brands: revenue from
    "small-quantity" lineitems — rows whose quantity is below 20% of
    the average quantity for their part — grouped by brand.

    Plan: (1) lineitem groupBy l_partkey → per-part avg threshold
    (partial agg before the shuffle, output |part| rows);
    (2) join thresholds + part dims back onto lineitem;
    (3) filter + brand agg. Three scans' worth of work total; the
    naive correlated form re-scans lineitem per outer row. The
    threshold/part joins are deliberately un-hinted: both sides are
    |part|-cardinality, which AQE broadcasts at fixture SFs but
    correctly sort-merges at TPC-H scale where part is SF·200k rows
    — hinting broadcast here would OOM a real cluster. The
    threshold compare stays deterministic: avg is an exact decimal
    sum divided once in double, identically in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    thresholds = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
        )
        .select("l_partkey", (F.lit(0.2) * F.col("avg_qty")).alias("qty_cut"))
    )
    return (
        li.join(thresholds.withColumnRenamed("l_partkey", "t_partkey"),
                F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_qty_rows"),
        )
        .orderBy("p_brand")
    )


SCALAR_SUBQUERY_THRESHOLD_SQL = """
WITH thresholds AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS qty_cut
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small_qty_rows
FROM lineitem
JOIN thresholds ON lineitem.l_partkey = thresholds.l_partkey
JOIN part ON lineitem.l_partkey = part.p_partkey
WHERE l_quantity < qty_cut
GROUP BY p_brand
ORDER BY p_brand
"""


def cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N
    non-urgent orders — including N=0, which an inner join would
    silently drop (the whole point of the left outer).

    Plan: left-outer join customer→orders on custkey (sort-merge at
    scale; both sides shuffle once on the key), count(o_orderkey)
    per customer (NULL-skipping count gives 0 for no-match rows),
    then a second aggregation over |customers| rows whose output is
    the tiny histogram. No skew risk: custkey is the uniform PK.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUST_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
             WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders have at
    least one returned lineitem (EXISTS correlated subquery).

    Plan: LEFT SEMI join orders←lineitem on orderkey — the semi
    short-circuits on first match, so the join output carries each
    orders row at most once no matter how many lineitems matched
    (an inner-join + distinct would shuffle the full match
    multiplicity first). Then a 5-row aggregation.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    returned = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


EXISTS_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


#: Days after order date a shipment counts as late (fixture has no
#: l_commitdate/l_receiptdate; lateness is defined vs o_orderdate).
LATE_DAYS = 90


def suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape on the fixture schema: suppliers who were the
    *sole* late shipper on a finished multi-supplier order — the
    hardest classic subquery lattice (correlated EXISTS + NOT
    EXISTS against the same fact table), decorrelated into one
    per-order aggregate instead of two self-joins.

    Rewrite: aggregate lineitem per order ONCE into (distinct
    suppliers, distinct late suppliers, the late supplier key if
    unique); the EXISTS ("another supplier shipped") and NOT EXISTS
    ("no other supplier was late") both become predicates over
    those counts. The naive form scans lineitem three times and
    self-joins twice on l_orderkey; this form scans it once and
    shuffles once — per-order distinct-supplier state is tiny and
    bounded by suppliers-per-order (~7 max in TPC-H).

    Determinism: counts and keys only — no float math anywhere.
    """
    # NOT spread: measured 0.71 s -> 1.06 s with a spread exchange —
    # the orderkey SMJ already repartitions both sides
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS)
    per_order = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy(F.col("late_supp").alias("l_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "l_suppkey")
        .limit(50)
    )


SUPPLIERS_WAITING_SQL = f"""
WITH per_order AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                             THEN l.l_suppkey END) AS n_late_supp,
         min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1
)
SELECT late_supp AS l_suppkey, count(*) AS numwait
FROM per_order
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY 1
ORDER BY numwait DESC, l_suppkey
LIMIT 50
"""


def revenue_view_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue over a shipdate
    window, then keep the supplier(s) achieving the global maximum
    — aggregate-of-aggregate via a broadcast scalar, not a
    correlated ``WHERE rev = (SELECT max(rev) ...)`` rescan.

    Plan: one lineitem scan → per-supplier decimal revenue (partial
    agg, |supplier| rows) → 1-row max() broadcast-joined back as an
    equality filter. The revenue view is computed exactly once and
    reused for both sides, where the textbook SQL recomputes the
    view inside the scalar subquery. Revenue compares are exact
    DECIMAL — max-equality on doubles would be flaky.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
            .alias("total_revenue_d")
        )
    )
    top = rev.agg(F.max("total_revenue_d").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue_d == F.col("max_rev"))
        .select(
            "l_suppkey",
            F.col("total_revenue_d").cast("double").alias("total_revenue"),
        )
        .orderBy("l_suppkey")
    )


REVENUE_VIEW_MAX_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           AS total_revenue_d
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT l_suppkey, CAST(total_revenue_d AS DOUBLE) AS total_revenue
FROM rev
WHERE total_revenue_d = (SELECT max(total_revenue_d) FROM rev)
ORDER BY l_suppkey
"""


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between
    every ordered pair of distinct nations — supplier nation →
    customer nation — by ship year. The canonical snowflake
    multi-join: fact ⋈ two independent dimension chains.

    Plan: lineitem ⋈ orders is the one big fact⋈fact shuffle;
    supplier, customer and the two nation copies are broadcast
    (|supplier| = SF·10k, |customer| joined AFTER the orders
    reduction... customer is SF·150k — at fixture SFs AQE
    broadcasts it, at 100 TB it becomes the second fact shuffle;
    deliberately un-hinted). The pair × year output is tiny, so the
    final agg is partial-agg dominated — scan-bound end to end.
    """
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


NATION_TRADE_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


#: Q8 market-share target nation and part type.
MKT_NATION = "NATION_7"
MKT_PART_TYPE = "PROMO"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: MKT_NATION's share of ASIA-region PROMO-part
    revenue by order year — the conditional-aggregation-over-join
    classic: share = sum(volume WHERE supplier ∈ nation) /
    sum(volume), one pass, no second scan.

    Both sums accumulate in DECIMAL and divide once in double, so
    the share is deterministic. Join order mirrors Q7; part is the
    added broadcast dim that prunes the fact early (PROMO filter
    pushes into the part scan, then the join drops ~5/6 of
    lineitem before the orders shuffle).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == MKT_PART_TYPE)
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cnat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    reg = (
        load_table(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    vol = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == cnat.c_nk)
        .join(F.broadcast(reg), cnat.c_rk == reg.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.s_nk)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(F.lit(0).cast(_DEC)))
            .alias("nation_vol_d"),
            F.sum(vol).alias("total_vol_d"),
        )
        .select(
            "o_year",
            F.col("nation_vol_d").cast("double").alias("nation_volume"),
            F.col("total_vol_d").cast("double").alias("total_volume"),
            (
                F.col("nation_vol_d").cast("double") / F.col("total_vol_d").cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = f"""
WITH j AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS vol,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{MKT_PART_TYPE}'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{MKT_NATION}' THEN vol
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(vol) AS DOUBLE) AS total_volume,
       CAST(SUM(CASE WHEN supp_nation = '{MKT_NATION}' THEN vol
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM j
GROUP BY 1
ORDER BY o_year
"""
