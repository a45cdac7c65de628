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

from ensembl_lakehouse_spark.sources.tables import load_table

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
