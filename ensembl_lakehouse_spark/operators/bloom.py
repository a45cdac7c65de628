"""Explicit Bloom-filter semi-join reduction (EXT): build a Bloom
filter over a filtered dimension's keys as a tiny bitmap relation,
probe the fact side against it BEFORE the real join, and audit the
false-positive cost — the runtime-filter trick that decides whether
a 100 TB fact⋈dim join ships terabytes or gigabytes into its
shuffle.

Spark applies this automatically in some plans (AQE runtime
bloom filters); materializing it explicitly does three things the
automatic path can't: (a) the filter becomes a PERSISTABLE artifact
(a snapshots.py table) reusable across queries/days, (b) the
false-positive rate is measured, not assumed, and (c) the oracle can
check the whole construction bit-for-bit.

Determinism: the k hash probes use the md5 contract
(functions/hashing.py); the bitmap build is an integer ``bit_or``
aggregate (commutative/associative ⇒ partition-order invariant);
the only float is one final shared-shape division.

Scale: the build side reduces to ≤ BLOOM_WORDS rows (a 4 KiB bitmap
— broadcast for free); the probe is map-side (explode k probes, join
the broadcast bitmap, AND the hits); the fact shuffle downstream
then carries only bloom-passing rows. Reference has no joins at all
(SURVEY §2: single-table queries, app/main.py:479).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.hashing import spark_md5_long31, sql_md5_long31
from ensembl_lakehouse_spark.sources.tables import load_table, spread_scan

#: Bitmap geometry: BLOOM_WORDS words of 63 usable bits each (bit 63
#: stays clear — DuckDB rejects 1<<63 as signed overflow and Spark
#: would silently wrap it negative; 63 keeps both engines exact);
#: k independent hashes.
BLOOM_WORDS = 64
BLOOM_BITS = BLOOM_WORDS * 63
BLOOM_K = 3

#: Build-side predicate: "high-value customers".
ACCTBAL_MIN = 8000.0


def _probe_structs_spark(key: str) -> tuple[list[str], str]:
    probes = ", ".join(
        f"named_struct('word', h{i} DIV 63, 'mask', shiftleft(CAST(1 AS BIGINT), "
        f"CAST(h{i} % 63 AS INT)))"
        for i in range(BLOOM_K)
    )
    lets = [
        spark_md5_long31(f"concat('{i}|', CAST({key} AS STRING))")
        + f" % {BLOOM_BITS} AS h{i}"
        for i in range(BLOOM_K)
    ]
    return lets, probes


def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-orderstatus audit of Bloom-pruned orders⋈customer: how
    many orders pass the Bloom filter of high-value customers, how
    many truly match (exact semi-join), and the false-positive
    count/rate. Zero false negatives by construction (a Bloom filter
    never drops a present key — asserted in pytest).
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > ACCTBAL_MIN)
        .select("c_custkey")
    )
    lets_c, probes_c = _probe_structs_spark("c_custkey")
    bloom = (
        cust.selectExpr("c_custkey", *lets_c)
        .selectExpr(f"explode(array({probes_c})) AS p")
        .select("p.word", "p.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    lets_o, probes_o = _probe_structs_spark("o_custkey")
    # Probe side spread (r11, guide §2.5): the 3·|orders| md5 probe
    # evaluation ran as ONE task on the single-row-group fixture
    # file; the conditional o_orderkey spread fans it out, and the
    # per-order bloom_pass aggregation clusters on the same key, so
    # the spread exchange REPLACES the agg exchange (no-op at scale;
    # min() of hits is partition-order invariant).
    spread_orders = spread_scan(
        orders, spark, sf_dir, "orders", "o_orderkey"
    )
    probes = (
        spread_orders.selectExpr("o_orderkey", "o_custkey", "o_orderstatus", *lets_o)
        .selectExpr(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            f"explode(array({probes_o})) AS p",
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "p.word", "p.mask")
    )
    hits = (
        probes.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))) != 0)
            .cast("int"),
        )
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
        .agg(F.min("hit").alias("bloom_pass"))
    )
    truth = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi").select(
        "o_orderkey", F.lit(1).alias("true_match")
    )
    return (
        hits.join(truth, "o_orderkey", "left")
        .withColumn("true_match", F.coalesce("true_match", F.lit(0)))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
            F.sum("true_match").cast("long").alias("n_true_match"),
            F.sum(F.expr("CASE WHEN bloom_pass = 1 AND true_match = 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_false_pos"),
        )
        .withColumn(
            "fp_rate",
            F.col("n_false_pos").cast("double") / F.col("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def _duck_lets(key: str) -> str:
    return ", ".join(
        sql_md5_long31(f"concat('{i}|', CAST({key} AS VARCHAR))")
        + f" % {BLOOM_BITS} AS h{i}"
        for i in range(BLOOM_K)
    )


def _duck_probes() -> str:
    return ", ".join(
        f"{{'word': h{i} // 63, 'mask': CAST(1 AS BIGINT) << CAST(h{i} % 63 AS INTEGER)}}"
        for i in range(BLOOM_K)
    )


JOIN_BLOOM_PRUNED_SQL = f"""
WITH cust AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {ACCTBAL_MIN}
), ch AS (
  SELECT c_custkey, {_duck_lets("c_custkey")} FROM cust
), bloom AS (
  SELECT p.word AS word, bit_or(p.mask) AS bits FROM (
    SELECT unnest([{_duck_probes()}]) AS p FROM ch)
  GROUP BY p.word
), oh AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, {_duck_lets("o_custkey")} FROM orders
), probes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, p.word AS word, p.mask AS mask FROM (
    SELECT o_orderkey, o_custkey, o_orderstatus, unnest([{_duck_probes()}]) AS p
    FROM oh)
), hits AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         MIN(CASE WHEN (COALESCE(bloom.bits, 0) & probes.mask) <> 0
                  THEN 1 ELSE 0 END) AS bloom_pass
  FROM probes LEFT JOIN bloom ON probes.word = bloom.word
  GROUP BY o_orderkey, o_custkey, o_orderstatus
), truth AS (
  SELECT DISTINCT o_orderkey, 1 AS true_match
  FROM orders JOIN cust ON o_custkey = c_custkey
)
SELECT hits.o_orderstatus AS o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(COALESCE(true_match, 0)) AS BIGINT) AS n_true_match,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND COALESCE(true_match, 0) = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND COALESCE(true_match, 0) = 0
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS fp_rate
FROM hits LEFT JOIN truth ON hits.o_orderkey = truth.o_orderkey
GROUP BY hits.o_orderstatus
ORDER BY o_orderstatus
"""
