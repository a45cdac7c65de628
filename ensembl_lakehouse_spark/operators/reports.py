"""Decision-analytics report pack (EXT, SURVEY §2 agg/window family):
the portfolio/risk/quality reports an analyst runs on the lakehouse
right after the per-table basics — each one a classic shape with a
non-obvious exact-at-scale formulation.

The reference's users run these against Athena as ad-hoc SQL
(app/main.py:479 ships the raw-SQL passthrough); here each is a
first-class, oracle-checked operator:

- ``skyline_pareto`` — the Pareto frontier (skyline) of parts on
  (minimize price, maximize size), with a grid prefilter so the
  exact single-ordering pass sees only near-frontier survivors.
- ``orders_rfm_segments`` — Recency/Frequency/Monetary quartile
  segmentation, the standard customer-base health report.
- ``benford_audit`` — first-significant-digit distribution vs
  Benford's law, the classic fraud/data-entry screen.
- ``target_encoding`` — smoothed (shrunk) per-category mean target
  encode, the leakage-safe categorical feature every tabular-ML
  pipeline derives at scale.
- ``feature_bin_lift`` — equal-width bins of a continuous feature
  vs a binary label with per-bin lift, the WOE/IV-style report in
  rational (log-free) form.
- ``revenue_yoy`` — year-over-year growth in basis points per
  return flag, truncation-safe for negative growth.
- ``revenue_concentration`` — customers-to-reach-50/80/95% revenue
  per market segment (the "how top-heavy is this book" report).

Determinism rules (memory: oracle-determinism-rules): per-row
fixed-point BIGINT before any SUM, integer DIV for every ratio
(Spark ``DIV`` and DuckDB ``//`` both truncate toward zero —
verified on negatives, so signed growth is safe), ntile ordered
with a full unique tie-break, no transcendentals (Benford's
expected shares are hard-coded integer literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.functions.stats import pearson_e6
from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

# ---------------------------------------------------------------------------
# skyline_pareto
# ---------------------------------------------------------------------------

#: Grid width (whole currency units) for the skyline prefilter.
SKYLINE_GRID = 100


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of distinct (p_retailprice, p_size) points:
    minimize price, maximize size. A point is on the skyline iff no
    other point has price <= AND size >= with at least one strict.

    Plan — two-phase so the exact pass never sees the bulk: (1) a
    grid prefilter groups points into price buckets, takes each
    bucket's max size (one parallel partial agg over |buckets|
    rows), and drops any point whose size <= the running max over
    all STRICTLY cheaper buckets (those dominators have strictly
    lower price, so the drop is safe; survivors provably include
    every dominator of every survivor — a dropped point's dominator
    chain ends in an even cheaper bucket that also dominates the
    would-be victim). (2) the exact running-max window — ordered by
    (price ASC, size DESC), a point survives iff every preceding
    point has a strictly smaller size — runs on the few near-
    frontier survivors, so its single-ordering cost is O(frontier),
    not O(table). The DuckDB oracle runs the exact pass over ALL
    points, pinning that the prefilter drops no frontier point.
    """
    pts = (
        load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .distinct()
        .withColumn(
            "bucket",
            F.expr(f"CAST(floor(p_retailprice) AS BIGINT) DIV {SKYLINE_GRID}"),
        )
    )
    bucket_prev_max = (
        pts.groupBy("bucket")
        .agg(F.max("p_size").alias("bucket_max"))
        .withColumn(
            "prev_max",
            F.expr(
                "max(bucket_max) OVER (ORDER BY bucket "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            ),
        )
        .select("bucket", "prev_max")
    )
    survivors = pts.join(F.broadcast(bucket_prev_max), "bucket").where(
        "prev_max IS NULL OR p_size > prev_max"
    )
    return (
        survivors.withColumn(
            "max_prev_size",
            F.expr(
                "max(p_size) OVER (ORDER BY p_retailprice ASC, p_size DESC "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            ),
        )
        .where("max_prev_size IS NULL OR max_prev_size < p_size")
        .select("p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size")
    )


SKYLINE_PARETO_SQL = """
WITH pts AS (
  SELECT DISTINCT p_retailprice, p_size FROM part
), ranked AS (
  SELECT p_retailprice, p_size,
         max(p_size) OVER (ORDER BY p_retailprice ASC, p_size DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_size
  FROM pts
)
SELECT p_retailprice, p_size
FROM ranked
WHERE max_prev_size IS NULL OR max_prev_size < p_size
ORDER BY p_retailprice, p_size
"""


# ---------------------------------------------------------------------------
# orders_rfm_segments
# ---------------------------------------------------------------------------


#: Quantile buckets per RFM dimension.
RFM_QUANTILES = 4


def orders_rfm_segments(
    spark: SparkSession, sf_dir: str, *, quantiles: int = RFM_QUANTILES
) -> DataFrame:
    """RFM segmentation: per customer compute Recency (days since
    last order, anchored to the corpus max order date so the report
    is reproducible), Frequency (order count) and Monetary (lifetime
    cents); quartile each with ntile(4) and report segment sizes.

    ntile's bucket boundaries depend only on the TOTAL order, so
    each ORDER BY carries the unique o_custkey tie-break —
    bit-identical across engines. Monetary is per-row cents before
    the SUM (order-invariant BIGINT lattice).

    Plan: one partial agg to |customers| rows; the three tilings run
    through the boundary-broadcast primitive (operators/tiling.py) —
    the executed plan assigns all three tiles with broadcast cutoff
    literals, map-only, so no |customers|-scale SinglePartition
    window (the r8 VERDICT's one flagged scale-killer class) and no
    per-spec bucket exchange (r10 VERDICT #3) survive into exec; the
    final segment rollup runs on ≤ quantiles³ cells. All three
    cutoff sets come from the SAME shared plan-build jobs (r9
    VERDICT #3 — the chained form paid six), memoized per process
    under the input-file fingerprint so repeat submits/EXPLAINs pay
    zero scans.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "datediff(max(CAST(o_orderdate AS DATE)), DATE '1970-01-01')"
        ).alias("last_epoch_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.expr(
                "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            )
        ).alias("monetary_cents"),
    )
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntiles

    # recency ntile WITHOUT materializing recency: recency_days =
    # anchor − last_date with a corpus-constant anchor, so
    # ``ORDER BY recency_days ASC, o_custkey ASC`` is the same total
    # order as ``ORDER BY last_date DESC, o_custkey ASC`` — tiling
    # on epoch days DESC is bit-identical and drops the anchor
    # subquery's extra orders scan + broadcast from the plan (the
    # oracle keeps the anchored form; same order ⇒ same tiles)
    scored = with_global_ntiles(
        per_cust,
        [
            ("last_epoch_days", "o_custkey", quantiles, "r_q", True),
            ("frequency", "o_custkey", quantiles, "f_q", True),
            ("monetary_cents", "o_custkey", quantiles, "m_q", True),
        ],
        cache_ns="orders_rfm_segments",
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("segment_cents"),
            F.min("o_custkey").alias("sample_custkey"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


ORDERS_RFM_SEGMENTS_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_date,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
), anchored AS (
  SELECT p.*, datediff('day', p.last_date, a.anchor_date) AS recency_days
  FROM per_cust p
  CROSS JOIN (SELECT max(CAST(o_orderdate AS DATE)) AS anchor_date
              FROM orders) a
), scored AS (
  SELECT o_custkey, monetary_cents,
         ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_q,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_q,
         ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC) AS m_q
  FROM anchored
)
SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
       min(o_custkey) AS sample_custkey
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

#: Benford's law expected first-digit shares in basis points
#: (floor(log10(1+1/d) * 10000) precomputed — no transcendentals in
#: the checked plan, digits 1..9).
BENFORD_BP = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791, 6: 669, 7: 579, 8: 511, 9: 457}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in BENFORD_BP.items()
) + " END"


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit of o_totalprice against
    Benford's law — the classic anomaly screen for fabricated or
    truncated monetary data.

    The first digit is taken from the integer part's decimal string
    (prices are >= 1 in this schema), so no log10 is needed; the
    expected shares are integer basis-point literals. Observed share
    uses integer DIV.

    Plan: map-side digit extraction, one 9-row aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) "
            "AS STRING), 1, 1) AS INT)"
        ).alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        counted.withColumn(
            "total", F.expr("sum(n_orders) OVER ()")
        )
        .withColumn("observed_bp", F.expr("(n_orders * 10000) DIV total"))
        .withColumn("benford_bp", F.expr(_BENFORD_CASE))
        .withColumn("delta_bp", F.expr("observed_bp - benford_bp"))
        .select("first_digit", "n_orders", "observed_bp", "benford_bp", "delta_bp")
        .orderBy("first_digit")
    )


BENFORD_AUDIT_SQL = f"""
WITH counted AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                        1, 1) AS INT) AS first_digit,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), shared AS (
  SELECT first_digit, n_orders,
         CAST((n_orders * 10000) // SUM(n_orders) OVER () AS BIGINT)
           AS observed_bp
  FROM counted
)
SELECT first_digit, n_orders, observed_bp,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_bp,
       CAST(observed_bp - {_BENFORD_CASE} AS BIGINT) AS delta_bp
FROM shared
ORDER BY first_digit
"""


# ---------------------------------------------------------------------------
# target_encoding
# ---------------------------------------------------------------------------

#: Shrinkage prior weight (pseudo-observations of the global mean).
TE_PRIOR = 20


def target_encoding(
    spark: SparkSession, sf_dir: str, *, prior: int = TE_PRIOR
) -> DataFrame:
    """Smoothed target encoding of (market segment × nation) against
    order value: enc = (sum + PRIOR * global_mean) / (n + PRIOR) —
    the shrinkage that keeps rare categories from memorizing noise.

    All arithmetic is integer cents: per-row fixed-point before the
    SUM, global mean via one integer DIV of two broadcast scalars,
    the encode itself one integer DIV per category row.

    Plan: orders⋈customer on custkey is the one fact shuffle (left
    to AQE — both sides are fact-sized at 100 TB, a sort-merge
    join); the category agg collapses to |segments × nations| rows;
    the one-row global aggregate is broadcast back.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment", "c_nationkey"
    )
    joined = orders.join(cust, "o_custkey")
    global_mean = joined.agg(
        F.expr("sum(cents) DIV count(*)").alias("global_mean_cents")
    )
    return (
        joined.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
        .crossJoin(F.broadcast(global_mean))
        .withColumn(
            "enc_cents",
            F.expr(
                f"(sum_cents + {prior} * global_mean_cents) "
                f"DIV (n_orders + {prior})"
            ),
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "n_orders",
            "sum_cents",
            "global_mean_cents",
            "enc_cents",
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


TARGET_ENCODING_SQL = f"""
WITH joined AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), g AS (
  SELECT CAST(CAST(SUM(cents) AS BIGINT) // COUNT(*) AS BIGINT)
           AS global_mean_cents
  FROM joined
), cat AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM joined GROUP BY 1, 2
)
SELECT c_mktsegment, c_nationkey, n_orders, sum_cents, global_mean_cents,
       CAST((sum_cents + {TE_PRIOR} * global_mean_cents)
            // (n_orders + {TE_PRIOR}) AS BIGINT) AS enc_cents
FROM cat CROSS JOIN g
ORDER BY c_mktsegment, c_nationkey
"""


# ---------------------------------------------------------------------------
# feature_bin_lift
# ---------------------------------------------------------------------------

#: Equal-width bin size in whole currency units.
BIN_WIDTH = 50_000


def feature_bin_lift(
    spark: SparkSession, sf_dir: str, *, bin_width: int = BIN_WIDTH
) -> DataFrame:
    """Feature-vs-label binning report: equal-width bins of
    o_totalprice against the binary label "order is finalized"
    (o_orderstatus = 'F'), with per-bin positive rate and lift in
    basis points — the rational (log-free) twin of a WOE/IV table.

    lift_bp = ((bin_pos * 10000) DIV bin_n) * total_n DIV total_pos
    — the staged integer DIV from basket_rules: every intermediate
    stays in BIGINT at any corpus size (DECIMAL(38,0) `//` rounds in
    DuckDB but truncates in Spark, so the single-division DECIMAL
    form diverges by 1 ulp; the staged form is engine-identical).

    Plan: map-side bin index, one |bins|-row agg, one-row totals
    broadcast back.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(f"CAST(floor(o_totalprice) AS BIGINT) DIV {bin_width}").alias(
            "bin"
        ),
        F.expr(
            "CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("pos"),
    )
    per_bin = orders.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("pos").alias("n_pos")
    )
    totals = orders.agg(
        F.count(F.lit(1)).alias("total_n"), F.sum("pos").alias("total_pos")
    )
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .withColumn(
            "pos_rate_bp", F.expr("(n_pos * 10000) DIV n_orders")
        )
        .withColumn(
            "lift_bp",
            F.expr(
                "((n_pos * 10000) DIV n_orders) * total_n DIV total_pos"
            ),
        )
        .withColumn("bin_lo", F.expr(f"bin * {bin_width}"))
        .select("bin", "bin_lo", "n_orders", "n_pos", "pos_rate_bp", "lift_bp")
        .orderBy("bin")
    )


FEATURE_BIN_LIFT_SQL = f"""
WITH src AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) // {BIN_WIDTH} AS bin,
         CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT)
           AS pos
  FROM orders
), per_bin AS (
  SELECT bin, COUNT(*) AS n_orders, CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM src GROUP BY 1
), totals AS (
  SELECT COUNT(*) AS total_n, CAST(SUM(pos) AS BIGINT) AS total_pos FROM src
)
SELECT bin, bin * {BIN_WIDTH} AS bin_lo, n_orders, n_pos,
       CAST((n_pos * 10000) // n_orders AS BIGINT) AS pos_rate_bp,
       CAST(((n_pos * 10000) // n_orders) * total_n // total_pos AS BIGINT)
         AS lift_bp
FROM per_bin CROSS JOIN totals
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# revenue_yoy
# ---------------------------------------------------------------------------


def revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year shipped-revenue growth per return flag, in
    basis points. Revenue is per-row cents of
    extendedprice*(1-discount) BEFORE the sum; growth is
    (rev - prev) * 10000 DIV prev — Spark DIV and DuckDB // both
    truncate toward zero, so negative growth years agree bit-for-bit
    (verified: -7 DIV 2 = -3 on both engines).

    Plan: one partial agg to |flags × years| rows; the lag window
    runs on that tiny relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    yearly = (
        li.groupBy(
            "l_returnflag", F.year("l_shipdate").alias("ship_year")
        ).agg(
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + "
                    "CAST(0.5 AS DOUBLE)) AS BIGINT)"
                )
            ).alias("rev_cents")
        )
    )
    return (
        yearly.withColumn(
            "prev_cents",
            F.expr(
                "lag(rev_cents) OVER (PARTITION BY l_returnflag "
                "ORDER BY ship_year)"
            ),
        )
        .withColumn(
            "growth_bp",
            F.expr(
                "CAST((CAST(rev_cents - prev_cents AS DECIMAL(38,0)) "
                "* 10000) DIV prev_cents AS BIGINT)"
            ),
        )
        .select("l_returnflag", "ship_year", "rev_cents", "prev_cents", "growth_bp")
        .orderBy("l_returnflag", "ship_year")
    )


REVENUE_YOY_SQL = """
WITH yearly AS (
  SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 +
                             CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY 1, 2
), lagged AS (
  SELECT l_returnflag, ship_year, rev_cents,
         lag(rev_cents) OVER (PARTITION BY l_returnflag
                              ORDER BY ship_year) AS prev_cents
  FROM yearly
)
SELECT l_returnflag, ship_year, rev_cents, prev_cents,
       CAST((CAST(rev_cents - prev_cents AS HUGEINT) * 10000)
            // prev_cents AS BIGINT) AS growth_bp
FROM lagged
ORDER BY l_returnflag, ship_year
"""


# ---------------------------------------------------------------------------
# revenue_concentration
# ---------------------------------------------------------------------------


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report: per market segment, how many
    customers it takes to cover 50/80/95% of segment revenue — the
    top-heaviness measure behind every key-account strategy.

    A customer belongs to the X% set iff the revenue accumulated
    BEFORE them (cum - own) is still short of X% of the segment
    total; the comparisons are cross-multiplied integers
    ((cum-own)*100 < total*X), so no division happens at all.
    The cum window is fully tie-broken (revenue DESC, custkey ASC).

    Plan: orders⋈customer fact shuffle, |segment × customer| partial
    agg, one per-segment window, 5-row final agg.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    per_cust = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    cum = per_cust.withColumn(
        "cum_before",
        F.expr(
            "sum(rev_cents) OVER (PARTITION BY c_mktsegment "
            "ORDER BY rev_cents DESC, o_custkey ASC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
    ).withColumn(
        "total_cents",
        F.expr("sum(rev_cents) OVER (PARTITION BY c_mktsegment)"),
    ).withColumn("cum_prev", F.expr("coalesce(cum_before, CAST(0 AS BIGINT))"))
    return (
        cum.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.expr(
                    "CAST(CASE WHEN CAST(cum_prev AS DECIMAL(38,0)) * 100 < "
                    "CAST(total_cents AS DECIMAL(38,0)) * 50 "
                    "THEN 1 ELSE 0 END AS BIGINT)"
                )
            ).alias("n_top50"),
            F.sum(
                F.expr(
                    "CAST(CASE WHEN CAST(cum_prev AS DECIMAL(38,0)) * 100 < "
                    "CAST(total_cents AS DECIMAL(38,0)) * 80 "
                    "THEN 1 ELSE 0 END AS BIGINT)"
                )
            ).alias("n_top80"),
            F.sum(
                F.expr(
                    "CAST(CASE WHEN CAST(cum_prev AS DECIMAL(38,0)) * 100 < "
                    "CAST(total_cents AS DECIMAL(38,0)) * 95 "
                    "THEN 1 ELSE 0 END AS BIGINT)"
                )
            ).alias("n_top95"),
            F.max("total_cents").alias("total_cents"),
        )
        .orderBy("c_mktsegment")
    )


REVENUE_CONCENTRATION_SQL = """
WITH per_cust AS (
  SELECT c_mktsegment, o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT c_mktsegment, rev_cents,
         coalesce(CAST(sum(rev_cents) OVER (PARTITION BY c_mktsegment
             ORDER BY rev_cents DESC, o_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           CAST(0 AS BIGINT)) AS cum_prev,
         CAST(sum(rev_cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
           AS total_cents
  FROM per_cust
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN CAST(cum_prev AS HUGEINT) * 100
                     < CAST(total_cents AS HUGEINT) * 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_top50,
       CAST(SUM(CASE WHEN CAST(cum_prev AS HUGEINT) * 100
                     < CAST(total_cents AS HUGEINT) * 80
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
       CAST(SUM(CASE WHEN CAST(cum_prev AS HUGEINT) * 100
                     < CAST(total_cents AS HUGEINT) * 95
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_top95,
       max(total_cents) AS total_cents
FROM cum
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# discount_band_lift (round 6)
# ---------------------------------------------------------------------------


def discount_band_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing analysis: per discount band (whole percent), line
    count, quantity, revenue cents and each band's share of total
    revenue in basis points — does discounting move volume?

    Per-row cents are fixed-point BIGINT before the SUM; the revenue
    share is one integer DIV against a broadcast 1-row total. One
    partial agg to ~12 bands.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("band_pct"),
        F.expr(
            "CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("rev_cents"),
    )
    bands = li.groupBy("band_pct").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("rev_cents").cast("long").alias("revenue_cents"),
    )
    total = bands.agg(
        F.sum("revenue_cents").cast("long").alias("total_cents")
    )
    return (
        bands.crossJoin(F.broadcast(total))
        .withColumn(
            "revenue_share_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000)"
                " DIV total_cents AS BIGINT)"
            ),
        )
        .select(
            "band_pct", "n_lines", "total_qty", "revenue_cents",
            "revenue_share_bp",
        )
        .orderBy("band_pct")
    )


DISCOUNT_BAND_LIFT_SQL = """
WITH li AS (
  SELECT CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS band_pct,
         CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev_cents
  FROM lineitem
), bands AS (
  SELECT band_pct,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(qty) AS BIGINT) AS total_qty,
         CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
  FROM li GROUP BY band_pct
), total AS (
  SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM bands
)
SELECT band_pct, n_lines, total_qty, revenue_cents,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000) // total_cents
            AS BIGINT) AS revenue_share_bp
FROM bands CROSS JOIN total
ORDER BY band_pct
"""


# ---------------------------------------------------------------------------
# priority_mix_monthly (round 6)
# ---------------------------------------------------------------------------


def priority_mix_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix by month with month-over-month drift: per
    (month, priority) the order count, the priority's share of that
    month in basis points, and the share delta vs the previous month
    — the operational health trend (a rising URGENT share is a
    process change or a data problem).

    Plan: one partial agg to |months|·|priorities| rows; both
    windows (month-total share, MoM lag) run on that tiny relation.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(date_trunc('MONTH', o_orderdate) AS DATE)").alias(
            "month"
        ),
        "o_orderpriority",
    )
    mix = orders.groupBy("month", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return (
        mix.withColumn(
            "share_bp",
            F.expr(
                "(n_orders * 10000) DIV sum(n_orders) "
                "OVER (PARTITION BY month)"
            ),
        )
        .withColumn(
            "mom_delta_bp",
            F.expr(
                "share_bp - lag(share_bp) OVER "
                "(PARTITION BY o_orderpriority ORDER BY month)"
            ),
        )
        .orderBy("month", "o_orderpriority")
    )


PRIORITY_MIX_MONTHLY_SQL = """
WITH mix AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
), shared AS (
  SELECT month, o_orderpriority, n_orders,
         (n_orders * 10000) // CAST(SUM(n_orders)
           OVER (PARTITION BY month) AS BIGINT) AS share_bp
  FROM mix
)
SELECT month, o_orderpriority, n_orders, share_bp,
       share_bp - lag(share_bp) OVER (PARTITION BY o_orderpriority
         ORDER BY month) AS mom_delta_bp
FROM shared
ORDER BY month, o_orderpriority
"""


# ---------------------------------------------------------------------------
# brand_price_dispersion (round 6)
# ---------------------------------------------------------------------------


def brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price structure: part count, distinct type count,
    min/mean/max retail price in cents and the min-max spread — the
    assortment/pricing-consistency report.

    One partial agg to |brands| rows; the distinct-type count rides
    the same exchange as a count(distinct) expansion.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_type",
        F.expr(
            "CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.countDistinct("p_type").cast("long").alias("n_types"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .withColumn("mean_cents", F.expr("sum_cents DIV n_parts"))
        .withColumn("spread_cents", F.expr("max_cents - min_cents"))
        .select(
            "p_brand", "n_parts", "n_types", "min_cents", "mean_cents",
            "max_cents", "spread_cents",
        )
        .orderBy("p_brand")
    )


BRAND_PRICE_DISPERSION_SQL = """
WITH part_c AS (
  SELECT p_brand, p_type,
         CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM part
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(SUM(cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST(MAX(cents) - MIN(cents) AS BIGINT) AS spread_cents
FROM part_c
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# supplier_nation_balance (round 6)
# ---------------------------------------------------------------------------


def supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier financial health per nation: supplier count, total
    and mean account balance in cents, and the share of suppliers in
    the red (negative balance) in basis points — the credit-risk
    screen over the supplier dimension.

    One partial agg to |nations| rows with the broadcast nation dim.
    """
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        F.expr(
            "CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("bal_cents"),
    )
    return (
        supp.join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("bal_cents").cast("long").alias("total_cents"),
            F.sum(F.when(F.col("bal_cents") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
        )
        .withColumn("mean_cents", F.expr("total_cents DIV n_suppliers"))
        .withColumn(
            "negative_share_bp", F.expr("(n_negative * 10000) DIV n_suppliers")
        )
        .select(
            "n_name", "n_suppliers", "total_cents", "mean_cents",
            "n_negative", "negative_share_bp",
        )
        .orderBy("n_name")
    )


SUPPLIER_NATION_BALANCE_SQL = """
WITH supp AS (
  SELECT s_nationkey,
         CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS bal_cents
  FROM supplier
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(s.bal_cents) AS BIGINT) AS total_cents,
       CAST(SUM(s.bal_cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         AS mean_cents,
       CAST(SUM(CASE WHEN s.bal_cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       (CAST(SUM(CASE WHEN s.bal_cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
         * 10000) // CAST(COUNT(*) AS BIGINT) AS negative_share_bp
FROM supp s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# feature_drift_chi2
# ---------------------------------------------------------------------------

#: Price band width (whole currency units) for the drift histogram.
DRIFT_BAND = 50000
#: Baseline / comparison order years.
DRIFT_YEAR_A = 1995
DRIFT_YEAR_B = 1996


def feature_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-distribution drift monitor: chi-square contribution of
    each o_totalprice band between a baseline year and the next, per
    order priority — the PSI-style "did this feature's distribution
    move" screen every production training pipeline runs before
    retraining (PSI itself needs ln; the chi-square statistic is the
    log-free twin and ranks bands identically for small shifts).

    Expected counts scale the baseline band to the comparison
    year's volume: exp = cA·tB/tA; the per-band contribution is
    (obs−exp)²/exp = (obs·tA − cA·tB)² / (cA·tA·tB). Everything up
    to the final quotient is BIGINT (obs·tA ≈ 2e10 at sf0.1 — six
    orders of headroom); the quotient is ONE shared expression
    template of correctly-rounded double ops, bit-identical across
    engines, and per-ROW (each band is its own output row — the
    chi-square total is the consumer's integer-safe sum of
    contrib_e6). Bands new in year B (cA = 0, chi2 undefined) are
    reported with NULL contrib rather than dropped — a brand-new
    band is the loudest drift signal there is.

    Plan: one partial agg over the two-year scan to |priority ×
    band × 2| rows, a dim-bounded outer join of the two year
    histograms, per-priority totals via window over ≤|bands| rows.
    The 100 TB cost is the map-side histogram combine; nothing
    after it is data-proportional.
    """
    orders = load_table(spark, sf_dir, "orders")
    def year_hist(year: int, cname: str) -> DataFrame:
        return (
            orders.where(F.expr(f"year(o_orderdate) = {year}"))
            .groupBy(
                F.col("o_orderpriority").alias("priority"),
                F.expr(
                    f"CAST(FLOOR(o_totalprice / {DRIFT_BAND}) AS BIGINT)"
                ).alias("band"),
            )
            .agg(F.count(F.lit(1)).alias(cname))
        )
    a = year_hist(DRIFT_YEAR_A, "c_a")
    b = year_hist(DRIFT_YEAR_B, "c_b")
    joined = (
        a.join(b, ["priority", "band"], "full_outer")
        .withColumn("c_a", F.expr("coalesce(c_a, CAST(0 AS BIGINT))"))
        .withColumn("c_b", F.expr("coalesce(c_b, CAST(0 AS BIGINT))"))
        .withColumn("tot_a", F.expr("SUM(c_a) OVER (PARTITION BY priority)"))
        .withColumn("tot_b", F.expr("SUM(c_b) OVER (PARTITION BY priority)"))
    )
    contrib = (
        "CASE WHEN c_a > 0 THEN CAST(FLOOR(((CAST(c_b * tot_a - c_a * tot_b"
        " AS DOUBLE) * CAST(c_b * tot_a - c_a * tot_b AS DOUBLE))"
        " * 1000000.0) / ((CAST(c_a AS DOUBLE) * CAST(tot_a AS DOUBLE))"
        " * CAST(tot_b AS DOUBLE))) AS BIGINT) END"
    )
    return (
        joined.where("tot_a > 0 AND tot_b > 0")
        .withColumn("chi2_contrib_e6", F.expr(contrib))
        .select(
            "priority", "band", "c_a", "c_b", "tot_a", "tot_b",
            "chi2_contrib_e6",
        )
        .orderBy("priority", "band")
    )


FEATURE_DRIFT_CHI2_SQL = f"""
WITH a AS (
  SELECT o_orderpriority AS priority,
         CAST(FLOOR(o_totalprice / {DRIFT_BAND}) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS c_a
  FROM orders WHERE year(o_orderdate) = {DRIFT_YEAR_A}
  GROUP BY 1, 2
), b AS (
  SELECT o_orderpriority AS priority,
         CAST(FLOOR(o_totalprice / {DRIFT_BAND}) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS c_b
  FROM orders WHERE year(o_orderdate) = {DRIFT_YEAR_B}
  GROUP BY 1, 2
), joined AS (
  SELECT COALESCE(a.priority, b.priority) AS priority,
         COALESCE(a.band, b.band) AS band,
         COALESCE(a.c_a, CAST(0 AS BIGINT)) AS c_a,
         COALESCE(b.c_b, CAST(0 AS BIGINT)) AS c_b
  FROM a FULL OUTER JOIN b
    ON a.priority = b.priority AND a.band = b.band
), tot AS (
  SELECT priority, band, c_a, c_b,
         CAST(SUM(c_a) OVER (PARTITION BY priority) AS BIGINT) AS tot_a,
         CAST(SUM(c_b) OVER (PARTITION BY priority) AS BIGINT) AS tot_b
  FROM joined
)
SELECT priority, band, c_a, c_b, tot_a, tot_b,
       CASE WHEN c_a > 0 THEN CAST(FLOOR(((CAST(c_b * tot_a - c_a * tot_b
         AS DOUBLE) * CAST(c_b * tot_a - c_a * tot_b AS DOUBLE))
         * 1000000.0) / ((CAST(c_a AS DOUBLE) * CAST(tot_a AS DOUBLE))
         * CAST(tot_b AS DOUBLE))) AS BIGINT) END AS chi2_contrib_e6
FROM tot
WHERE tot_a > 0 AND tot_b > 0
ORDER BY priority, band
"""


# ---------------------------------------------------------------------------
# discount_quantity_corr
# ---------------------------------------------------------------------------

def discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-sensitivity screen: per part brand, the Pearson
    correlation between a lineitem's discount and its quantity —
    "do deeper discounts actually move more units for this brand".
    The demand-elasticity proxy every assortment/pricing report
    starts from (the true elasticity needs a demand model; the
    correlation is the screen that says where to look).

    Exactness (events_autocorr24's recipe): discount is snapped to
    integer basis points per ROW (floor(x·10⁴+0.5) — the values are
    hundredths, so this is exact re-quantization, not rounding
    noise), quantity is already integral; all five moment sums are
    then BIGINT aggregates, and the final Pearson is the ONE shared
    sqrt/divide template over exact integers (IEEE-correctly-rounded
    double ops, bit-stable cross-engine).

    Plan: one map-side partial agg over the lineitem⋈part join —
    part is the broadcast dim — to |brands| moment rows. Nothing
    after the scan is data-proportional.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(l_discount * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mom = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("y * y")).alias("syy"),
        )
    )
    corr_tmpl = pearson_e6()
    return (
        mom.where(
            "n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
        )
        .withColumn("corr_e6", F.expr(corr_tmpl))
        .select("p_brand", "n", "sx", "sy", "corr_e6")
        .orderBy("p_brand")
    )


DISCOUNT_QUANTITY_CORR_SQL = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_discount * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
), mom AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n, sx, sy,
       {pearson_e6()} AS corr_e6
FROM mom
WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# customer_repeat_rate
# ---------------------------------------------------------------------------

def customer_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-base loyalty report per market segment: how many
    ordering customers came back (≥2 orders), the repeat share in
    basis points, and the mean inter-purchase interval among repeat
    customers — the retention headline next to orders_rfm_segments'
    quartile view.

    Per-customer interval = days(first→last) DIV (orders−1): the
    exact mean gap of an evenly-spaced ideal, integer-truncated; the
    segment mean is then BIGINT-sum DIV count. All integers — no
    float anywhere.

    Plan: per-customer agg on the orders scan (one shuffle keyed
    o_custkey), broadcast-join of the customer dim for the segment,
    |segments| final agg. Fact is funneled to |customers| rows
    before anything else happens.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    joined = per_cust.join(
        F.broadcast(cust), per_cust.o_custkey == cust.c_custkey
    ).withColumn(
        "gap_days",
        F.expr(
            "CASE WHEN n_orders > 1 "
            "THEN CAST(datediff(last_d, first_d) AS BIGINT) "
            "DIV (n_orders - 1) END"
        ),
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.expr("CASE WHEN n_orders > 1 THEN 1 ELSE 0 END")).alias(
                "n_repeat"
            ),
            F.sum(F.expr("coalesce(gap_days, CAST(0 AS BIGINT))")).alias(
                "gap_total"
            ),
        )
        .withColumn("repeat_bp", F.expr("(n_repeat * 10000) DIV n_customers"))
        .withColumn(
            "mean_gap_days",
            F.expr("CASE WHEN n_repeat > 0 THEN gap_total DIV n_repeat END"),
        )
        .select(
            "c_mktsegment", "n_customers", "n_repeat", "repeat_bp",
            "mean_gap_days",
        )
        .orderBy("c_mktsegment")
    )


CUSTOMER_REPEAT_RATE_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         MIN(CAST(o_orderdate AS DATE)) AS first_d,
         MAX(CAST(o_orderdate AS DATE)) AS last_d
  FROM orders GROUP BY o_custkey
), joined AS (
  SELECT c_mktsegment, n_orders,
         CASE WHEN n_orders > 1
              THEN CAST(datediff('day', first_d, last_d) AS BIGINT)
                   // (n_orders - 1) END AS gap_days
  FROM per_cust JOIN customer ON o_custkey = c_custkey
), seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeat,
         CAST(SUM(COALESCE(gap_days, CAST(0 AS BIGINT))) AS BIGINT)
           AS gap_total
  FROM joined GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_customers, n_repeat,
       (n_repeat * 10000) // n_customers AS repeat_bp,
       CASE WHEN n_repeat > 0 THEN gap_total // n_repeat END
         AS mean_gap_days
FROM seg
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# supplier_hhi
# ---------------------------------------------------------------------------

def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration risk per nation: the Herfindahl–
    Hirschman index of supplier revenue shares — the antitrust/
    supply-chain-risk number (10000 = one supplier owns the nation's
    book; 10000/n = perfectly even). Complements
    revenue_concentration's "customers to reach X%" curve with the
    single-number concentration index on the SUPPLY side.

    Exactness: revenue is per-row cents (fixed-point BIGINT before
    any SUM); each supplier's share is an integer-DIV basis-point
    floor, and HHI = Σ share_bp² DIV 10000 — the floor-share HHI,
    identical in both engines by construction and within 1bp·n of
    the real-valued index.

    Plan: lineitem funnels to |suppliers| rows in ONE partial agg
    (supplier dim broadcasts), then |nations| final agg over the
    share window that reuses the nation partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) "
            "* 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_supp = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    shared = per_supp.withColumn(
        "share_bp",
        F.expr(
            "(rev_cents * 10000) DIV SUM(rev_cents) OVER (PARTITION BY n_name)"
        ),
    )
    return (
        shared.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("rev_cents").alias("nation_cents"),
            F.sum(F.expr("share_bp * share_bp")).alias("sq_sum"),
        )
        .withColumn("hhi_bp", F.expr("sq_sum DIV 10000"))
        .select("n_name", "n_suppliers", "nation_cents", "hhi_bp")
        .orderBy("n_name")
    )


SUPPLIER_HHI_SQL = """
WITH li AS (
  SELECT l_suppkey,
         CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM lineitem
), per_supp AS (
  SELECT n_name, s_suppkey, CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM li
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey
), shared AS (
  SELECT n_name, rev_cents,
         (rev_cents * 10000)
           // CAST(SUM(rev_cents) OVER (PARTITION BY n_name) AS BIGINT)
           AS share_bp
  FROM per_supp
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev_cents) AS BIGINT) AS nation_cents,
       CAST(SUM(share_bp * share_bp) AS BIGINT) // 10000 AS hhi_bp
FROM shared
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# orders_backlog_aging
# ---------------------------------------------------------------------------

#: Backlog age band width in days.
BACKLOG_BAND_DAYS = 180


def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: non-finalized orders (status O/P)
    bucketed into BACKLOG_BAND_DAYS age bands (age anchored at the
    corpus max order date, so the report is reproducible), with
    order counts, tied-up value in cents, and each band's share of
    its status' backlog — the working-capital report every ops
    review opens with, and the lakehouse twin of a ticket-queue
    aging dashboard.

    All-integer: ages are day diffs, value is per-row cents before
    the SUM, shares are integer-DIV basis points.

    Plan: the anchor is a 1-row agg broadcast back (orders_rfm's
    pattern); one partial agg to |status × bands| rows; the share
    window rides that dim-bounded relation.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        "o_orderstatus <> 'F'"
    )
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("anchor_date")
    )
    banded = (
        orders.crossJoin(F.broadcast(anchor))
        .select(
            "o_orderstatus",
            F.expr(
                "CAST(datediff(anchor_date, CAST(o_orderdate AS DATE)) "
                f"AS BIGINT) DIV {BACKLOG_BAND_DAYS}"
            ).alias("age_band"),
            F.expr(
                "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("cents"),
        )
    )
    return (
        banded.groupBy("o_orderstatus", "age_band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("value_cents"),
        )
        .withColumn(
            "share_bp",
            F.expr(
                "(n_orders * 10000) DIV "
                "SUM(n_orders) OVER (PARTITION BY o_orderstatus)"
            ),
        )
        .orderBy("o_orderstatus", "age_band")
    )


ORDERS_BACKLOG_AGING_SQL = f"""
WITH open_orders AS (
  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS odate,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders WHERE o_orderstatus <> 'F'
), anchored AS (
  SELECT o_orderstatus,
         CAST(datediff('day', odate,
           (SELECT MAX(odate) FROM open_orders)) AS BIGINT)
           // {BACKLOG_BAND_DAYS} AS age_band,
         cents
  FROM open_orders
), agg AS (
  SELECT o_orderstatus, age_band,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS value_cents
  FROM anchored GROUP BY o_orderstatus, age_band
)
SELECT o_orderstatus, age_band, n_orders, value_cents,
       (n_orders * 10000)
         // CAST(SUM(n_orders) OVER (PARTITION BY o_orderstatus) AS BIGINT)
         AS share_bp
FROM agg
ORDER BY o_orderstatus, age_band
"""


# ---------------------------------------------------------------------------
# supplier_lead_variability
# ---------------------------------------------------------------------------

#: Suppliers reported (least reliable first).
LEAD_VAR_TOP_N = 20


def supplier_lead_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability screen: the LEAD_VAR_TOP_N suppliers with
    the most VARIABLE order→ship lead time (sample variance of the
    day lead, centi-scaled) — order_ship_lead reports who is SLOW on
    average; this reports who is UNPREDICTABLE, which is what safety
    stock actually prices. Mean lead rides along so the reader can
    separate slow-but-steady from fast-but-erratic.

    All-integer: leads are day diffs; var_e2 = (n·Σd² − (Σd)²)·100
    DIV (n·(n−1)) and mean_e2 are single integer DIVs over BIGINT
    moment sums (Σd² ≈ 10⁹ per supplier at sf0.1 — ample headroom).

    Plan: the lineitem⋈orders fact-fact join (bucket-colocatable on
    the order key at 100 TB), one partial agg to |suppliers| moment
    rows, TakeOrderedAndProject for the top-N.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.col("l_shipdate").cast("date").alias("sdate"),
    )
    mom = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_suppkey",
            F.expr("CAST(datediff(sdate, odate) AS BIGINT)").alias("d"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sd"),
            F.sum(F.expr("d * d")).alias("sd2"),
        )
        .where("n > 1")
    )
    return (
        mom.withColumn(
            "var_e2", F.expr("((n * sd2 - sd * sd) * 100) DIV (n * (n - 1))")
        )
        .withColumn("mean_e2", F.expr("(sd * 100) DIV n"))
        .select("l_suppkey", "n", "mean_e2", "var_e2")
        .orderBy(F.desc("var_e2"), "l_suppkey")
        .limit(LEAD_VAR_TOP_N)
    )


SUPPLIER_LEAD_VARIABILITY_SQL = f"""
WITH mom AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd,
         CAST(SUM(d * d) AS BIGINT) AS sd2
  FROM (
    SELECT l_suppkey,
           CAST(datediff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS BIGINT) AS d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  )
  GROUP BY l_suppkey
  HAVING COUNT(*) > 1
)
SELECT l_suppkey, n,
       (sd * 100) // n AS mean_e2,
       ((n * sd2 - sd * sd) * 100) // (n * (n - 1)) AS var_e2
FROM mom
ORDER BY var_e2 DESC, l_suppkey
LIMIT {LEAD_VAR_TOP_N}
"""


# ---------------------------------------------------------------------------
# segment_priority_lift
# ---------------------------------------------------------------------------

def segment_priority_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority affinity per customer market segment: observed
    cell count vs the independence expectation in basis points
    (nation_trade_lift's formulation on the behavioral dims) — "do
    MACHINERY customers actually file more 1-URGENT orders". The
    marketing/ops cross-tab that raw counts can't answer because
    segment sizes differ.

    Integer-exact: lift_bp = (n · total · 10⁴) DIV (row·col), all
    BIGINT with ample headroom at any fixture multiple.

    Plan: one orders⋈customer pass (customer broadcast at test SF,
    un-hinted so AQE decides at scale), partial agg to |segments ×
    priorities| cells, marginal windows on that tiny matrix.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cells.withColumn(
            "row_tot", F.expr("SUM(n) OVER (PARTITION BY c_mktsegment)")
        )
        .withColumn(
            "col_tot", F.expr("SUM(n) OVER (PARTITION BY o_orderpriority)")
        )
        .withColumn("total", F.expr("SUM(n) OVER ()"))
        .withColumn(
            "lift_bp",
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * total * 10000) DIV "
                "(CAST(row_tot AS DECIMAL(38,0)) * col_tot) AS BIGINT)"
            ),
        )
        .select("c_mktsegment", "o_orderpriority", "n", "lift_bp")
        .orderBy("c_mktsegment", "o_orderpriority")
    )


SEGMENT_PRIORITY_LIFT_SQL = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), scored AS (
  SELECT c_mktsegment, o_orderpriority, n,
         CAST(SUM(n) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS row_tot,
         CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS col_tot,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM cells
)
SELECT c_mktsegment, o_orderpriority, n,
       CAST((CAST(n AS HUGEINT) * total * 10000)
            // (CAST(row_tot AS HUGEINT) * col_tot) AS BIGINT) AS lift_bp
FROM scored
ORDER BY c_mktsegment, o_orderpriority
"""


# ---------------------------------------------------------------------------
# region_revenue_share_trend
# ---------------------------------------------------------------------------

def region_revenue_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue mix over time: each region's share of global
    yearly revenue in basis points plus the year-over-year share
    delta — the "is APAC gaining on EUROPE" portfolio trend that
    join_region_revenue's all-time totals flatten away.

    Per-row cents before any SUM; shares and deltas are integer
    arithmetic; the YoY delta compares shares (already normalized),
    so volume growth common to all regions cancels.

    Plan: the one lineitem⋈orders fact-fact exchange (customer →
    nation → region dims broadcast), partial agg to |regions ×
    years| rows, share/lag windows on that tiny relation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) "
            "* 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.expr("year(o_orderdate)").alias("yr")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "yr")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    return (
        cells.withColumn(
            "share_bp",
            F.expr(
                "CAST((CAST(rev_cents AS DECIMAL(38,0)) * 10000) DIV "
                "SUM(rev_cents) OVER (PARTITION BY yr) AS BIGINT)"
            ),
        )
        .withColumn(
            "share_delta_bp",
            F.expr(
                "share_bp - lag(share_bp) OVER "
                "(PARTITION BY r_name ORDER BY yr)"
            ),
        )
        .select("r_name", "yr", "rev_cents", "share_bp", "share_delta_bp")
        .orderBy("r_name", "yr")
    )


REGION_REVENUE_SHARE_TREND_SQL = """
WITH cells AS (
  SELECT r_name, year(o_orderdate) AS yr,
         CAST(SUM(CAST(floor(l_extendedprice
           * (CAST(1 AS DOUBLE) - l_discount)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), shared AS (
  SELECT r_name, yr, rev_cents,
         CAST((CAST(rev_cents AS HUGEINT) * 10000)
           // SUM(rev_cents) OVER (PARTITION BY yr) AS BIGINT)
           AS share_bp
  FROM cells
)
SELECT r_name, yr, rev_cents, share_bp,
       share_bp - lag(share_bp) OVER (PARTITION BY r_name ORDER BY yr)
         AS share_delta_bp
FROM shared
ORDER BY r_name, yr
"""


# ---------------------------------------------------------------------------
# Round 7: discount give-back per part type
# ---------------------------------------------------------------------------

def part_type_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part type: net revenue, the discount give-back rate
    (list-price value conceded to discounts, in basis points of
    list), and the type's share of total net revenue — the
    assortment margin report: a type with high revenue share AND
    high give-back is where pricing discipline pays first.

    Determinism: list/net values snap to per-row cents (exact for
    TPC-H's 2-decimal money) before BIGINT sums; both ratios are
    one integer DIV each.

    Plan: lineitem⋈part with part BROADCAST; one partial agg to
    |types| rows; the share window rides the tiny relation
    (SinglePartition). Nothing after the scan is data-proportional.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("list_cents"),
        F.expr(
            "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) "
            "* 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("net_cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("list_cents").alias("list_cents"),
            F.sum("net_cents").alias("net_cents"),
        )
    )
    return (
        agg.withColumn(
            "giveback_bp",
            F.expr(
                "CAST((CAST(list_cents - net_cents AS DECIMAL(38,0)) "
                "* 10000) DIV list_cents AS BIGINT)"
            ),
        )
        .withColumn(
            "revenue_share_bp",
            F.expr(
                "CAST((CAST(net_cents AS DECIMAL(38,0)) * 10000) DIV "
                "SUM(net_cents) OVER () AS BIGINT)"
            ),
        )
        .select(
            "p_type", "n_lines", "list_cents", "net_cents",
            "giveback_bp", "revenue_share_bp",
        )
        .orderBy("p_type")
    )


PART_TYPE_MARGIN_SQL = """
WITH agg AS (
  SELECT p_type,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(floor(l_extendedprice * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS list_cents,
         CAST(SUM(CAST(floor(l_extendedprice
           * (CAST(1 AS DOUBLE) - l_discount)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS net_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type
)
SELECT p_type, n_lines, list_cents, net_cents,
       CAST((CAST(list_cents - net_cents AS HUGEINT) * 10000)
            // list_cents AS BIGINT) AS giveback_bp,
       CAST((CAST(net_cents AS HUGEINT) * 10000)
            // SUM(net_cents) OVER () AS BIGINT) AS revenue_share_bp
FROM agg
ORDER BY p_type
"""


# ---------------------------------------------------------------------------
# Round 7: month-of-year seasonal index
# ---------------------------------------------------------------------------

def seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index of order value: each calendar
    month's pooled share of revenue scaled so a flat series reads
    10000 — index_bp = month_total·12·10⁴ ÷ grand_total. The
    capacity/forecast baseline one step before any model:
    revenue_yoy says how years differ, this says how months WITHIN
    a year repeatably differ (pooled across all years so one
    anomalous year can't masquerade as seasonality).

    Integer-exact: per-order cents, BIGINT sums, two integer DIVs.

    Plan: orders only (no join); one partial agg to 12 rows; the
    total rides a SinglePartition window over those 12.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("month(o_orderdate)").alias("mon"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    return (
        orders.groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
        )
        .withColumn(
            "share_bp",
            F.expr(
                "CAST((CAST(rev_cents AS DECIMAL(38,0)) * 10000) DIV "
                "SUM(rev_cents) OVER () AS BIGINT)"
            ),
        )
        .withColumn(
            "index_bp",
            F.expr(
                "CAST((CAST(rev_cents AS DECIMAL(38,0)) * 120000) DIV "
                "SUM(rev_cents) OVER () AS BIGINT)"
            ),
        )
        .select("mon", "n_orders", "rev_cents", "share_bp", "index_bp")
        .orderBy("mon")
    )


SEASONAL_INDEX_SQL = """
WITH agg AS (
  SELECT month(o_orderdate) AS mon,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT mon, n_orders, rev_cents,
       CAST((CAST(rev_cents AS HUGEINT) * 10000)
            // SUM(rev_cents) OVER () AS BIGINT) AS share_bp,
       CAST((CAST(rev_cents AS HUGEINT) * 120000)
            // SUM(rev_cents) OVER () AS BIGINT) AS index_bp
FROM agg
ORDER BY mon
"""


# ---------------------------------------------------------------------------
# Round 7: inter-order cadence per market segment
# ---------------------------------------------------------------------------

def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between a customer's consecutive orders, rolled up per
    market segment — the replenishment-cycle report behind every
    churn model's "overdue" feature: a customer whose gap since
    their last order exceeds their segment's typical cadence is the
    churn-risk candidate. customer_repeat_rate counts repeaters;
    this measures their rhythm.

    Integer-exact: order dates collapse to epoch days (BIGINT);
    gaps are day differences; the segment mean is one integer DIV
    at e3 scale.

    Plan: ONE o_custkey window (lag over day, orderkey — unique
    tie-break) on the orders fact, customer dim joins BROADCAST,
    then a |segments|-row aggregate. Two exchanges.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "CAST(floor(unix_timestamp(o_orderdate) / 86400) AS BIGINT)"
        ).alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        orders.withColumn("prev_day", F.lag("day").over(w))
        .where(F.col("prev_day").isNotNull())
        .withColumn("gap_d", F.expr("day - prev_day"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_d").alias("sum_gap_d"),
            F.min("gap_d").alias("min_gap_d"),
            F.max("gap_d").alias("max_gap_d"),
        )
        .withColumn("mean_gap_e3", F.expr("(sum_gap_d * 1000) DIV n_gaps"))
        .select(
            "c_mktsegment", "n_gaps", "sum_gap_d", "min_gap_d",
            "max_gap_d", "mean_gap_e3",
        )
        .orderBy("c_mktsegment")
    )


CUSTOMER_ORDER_CADENCE_SQL = """
WITH seq AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         LAG(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT),
                    o_orderkey) AS prev_day
  FROM orders
), gaps AS (
  SELECT o_custkey, day - prev_day AS gap_d
  FROM seq WHERE prev_day IS NOT NULL
), agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_d) AS BIGINT) AS sum_gap_d,
         MIN(gap_d) AS min_gap_d,
         MAX(gap_d) AS max_gap_d
  FROM gaps JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, n_gaps, sum_gap_d, min_gap_d, max_gap_d,
       (sum_gap_d * 1000) // n_gaps AS mean_gap_e3
FROM agg
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Round 7: supplier concentration (HHI) per part
# ---------------------------------------------------------------------------

def part_supply_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain risk register: the TOP_CONC parts whose revenue
    is most concentrated across the suppliers that actually shipped
    them (observed from lineitem — the fixture carries no partsupp),
    scored by the Herfindahl–Hirschman index of supplier revenue
    shares (10000 = single-source) with the largest single-supplier
    share alongside. supplier_hhi is the nation-level sibling; this
    is per-part, where substitution actually happens, surfacing the
    parts to dual-source first.

    Determinism and overflow safety: per-(part, supplier) cents sum
    exactly; each supplier's share snaps to integer basis points of
    the part total (one DIV), and HHI = Σshare_bp² / 10⁴ — shares
    ≤ 10⁴ keep every product within BIGINT at ANY table size
    (squaring raw cents would overflow at ~10¹² per cell). The
    top-N order (hhi, rev, partkey) is a total order.

    Plan: (part, supplier) partial agg; the part-total window and
    the per-part HHI agg reuse the same part-keyed partitioning;
    the head is TakeOrderedAndProject — no global sort, ≤TOP_CONC
    rows leave the executors.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) "
            "* 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    cell = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("cents").alias("c")
    )
    shared = cell.withColumn(
        "total", F.expr("SUM(c) OVER (PARTITION BY l_partkey)")
    ).withColumn("share_bp", F.expr("(c * 10000) DIV total"))
    per_part = shared.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("total").alias("rev_cents"),
        F.expr("SUM(share_bp * share_bp) DIV 10000").alias("hhi_bp"),
        F.max("share_bp").alias("top_share_bp"),
    )
    return per_part.orderBy(
        F.desc("hhi_bp"), F.desc("rev_cents"), F.asc("l_partkey")
    ).limit(TOP_CONC)


#: Size of the supply-concentration risk register head.
TOP_CONC = 20


PART_SUPPLY_CONCENTRATION_SQL = f"""
WITH cell AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice
           * (CAST(1 AS DOUBLE) - l_discount)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
), shared AS (
  SELECT l_partkey, c,
         CAST(SUM(c) OVER (PARTITION BY l_partkey) AS BIGINT) AS total,
         (c * 10000) // CAST(SUM(c) OVER (PARTITION BY l_partkey) AS BIGINT)
           AS share_bp
  FROM cell
)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_supp,
       MAX(total) AS rev_cents,
       CAST(SUM(share_bp * share_bp) AS BIGINT) // 10000 AS hhi_bp,
       MAX(share_bp) AS top_share_bp
FROM shared GROUP BY l_partkey
ORDER BY hhi_bp DESC, rev_cents DESC, l_partkey ASC
LIMIT {TOP_CONC}
"""


# ---------------------------------------------------------------------------
# Round 7: market-segment × brand purchase affinity
# ---------------------------------------------------------------------------

def segment_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift of each (market segment, part brand) cell over the
    independence baseline — "which brands does BUILDING over-buy":
    lift_e6 > 1e6 means the segment buys the brand more than its
    overall volume predicts. The cross-sell / assortment-planning
    matrix; segment_priority_lift's twin one join deeper (it reads
    order attributes, this reaches through lineitem into the part
    dimension — the full fact⋈fact⋈dim⋈dim path).

    Determinism: lift_e6 = (cell·N·10⁶) DIV (row_total·col_total)
    over BIGINT line counts — all integers.

    Plan: the ONE lineitem⋈orders fact-fact exchange; customer and
    part dims BROADCAST; partial agg to |segments × brands| cells;
    marginals ride two windows on that dim-bounded matrix.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("c_mktsegment", "p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return (
        cells.withColumn(
            "seg_total",
            F.expr("SUM(n_lines) OVER (PARTITION BY c_mktsegment)"),
        )
        .withColumn(
            "brand_total", F.expr("SUM(n_lines) OVER (PARTITION BY p_brand)")
        )
        .withColumn("grand_total", F.expr("SUM(n_lines) OVER ()"))
        .withColumn(
            "lift_e6",
            F.expr(
                "(n_lines * grand_total * 1000000) DIV "
                "(seg_total * brand_total)"
            ),
        )
        .select(
            "c_mktsegment", "p_brand", "n_lines", "seg_total",
            "brand_total", "lift_e6",
        )
        .orderBy("c_mktsegment", "p_brand")
    )


SEGMENT_BRAND_AFFINITY_SQL = """
WITH cells AS (
  SELECT c_mktsegment, p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), m AS (
  SELECT c_mktsegment, p_brand, n_lines,
         CAST(SUM(n_lines) OVER (PARTITION BY c_mktsegment) AS BIGINT)
           AS seg_total,
         CAST(SUM(n_lines) OVER (PARTITION BY p_brand) AS BIGINT)
           AS brand_total,
         CAST(SUM(n_lines) OVER () AS BIGINT) AS grand_total
  FROM cells
)
SELECT c_mktsegment, p_brand, n_lines, seg_total, brand_total,
       (n_lines * grand_total * 1000000) // (seg_total * brand_total)
         AS lift_e6
FROM m
ORDER BY c_mktsegment, p_brand
"""


# ---------------------------------------------------------------------------
# Round 7: part-name term price lift
# ---------------------------------------------------------------------------

#: Minimum parts carrying a name term for it to enter the report.
NAME_TERM_MIN_SUPPORT = 5


def part_name_price_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which words in a part's NAME carry price: per name term, the
    average retail price vs the catalog average as a lift in basis
    points (10000 = neutral). The attribute-extraction screen every
    catalog team runs before structuring free-text names into real
    attributes — terms with stable high lift are latent attributes.

    Determinism: prices snap to cents per part; the lift is ONE
    cross-multiplied integer DIV (term_sum · catalog_n · 10⁴) ÷
    (term_n · catalog_sum) — no float division anywhere.

    Plan: the explode runs over the PART DIMENSION (SF·200k rows,
    not the fact table); one (term) partial agg; the 1-row catalog
    total joins by broadcast. Support-floored to kill noise terms.
    """
    part = load_table(spark, sf_dir, "part").select(
        F.expr(
            "CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
        F.split(F.col("p_name"), " ").alias("terms"),
    )
    exploded = part.select(
        F.explode("terms").alias("term"), "cents"
    ).where(F.length("term") > 0)
    per_term = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("sum_cents"),
    )
    total = part.agg(
        F.count(F.lit(1)).alias("g_n"),
        F.sum("cents").alias("g_sum"),
    )
    return (
        per_term.where(F.col("n_parts") >= NAME_TERM_MIN_SUPPORT)
        .crossJoin(F.broadcast(total))
        .withColumn("mean_cents", F.expr("sum_cents DIV n_parts"))
        .withColumn(
            "lift_bp",
            F.expr(
                "CAST((CAST(sum_cents AS DECIMAL(38,0)) * g_n * 10000) "
                "DIV (CAST(n_parts AS DECIMAL(38,0)) * g_sum) AS BIGINT)"
            ),
        )
        .select("term", "n_parts", "mean_cents", "lift_bp")
        .orderBy(F.desc("lift_bp"), F.asc("term"))
    )


PART_NAME_PRICE_LIFT_SQL = f"""
WITH p AS (
  SELECT CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents,
         string_split(p_name, ' ') AS terms
  FROM part
), exploded AS (
  SELECT unnest(terms) AS term, cents FROM p
), per_term AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM exploded WHERE length(term) > 0 GROUP BY term
), total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g_n,
         CAST(SUM(cents) AS BIGINT) AS g_sum
  FROM p
)
SELECT term, n_parts,
       sum_cents // n_parts AS mean_cents,
       CAST((CAST(sum_cents AS HUGEINT) * g_n * 10000)
            // (CAST(n_parts AS HUGEINT) * g_sum) AS BIGINT) AS lift_bp
FROM per_term, total
WHERE n_parts >= {NAME_TERM_MIN_SUPPORT}
ORDER BY lift_bp DESC, term ASC
"""


# ---------------------------------------------------------------------------
# Round 7: account balance vs order activity correlation
# ---------------------------------------------------------------------------

def balance_activity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment, the Pearson correlation between a
    customer's account balance and their order count — the
    credit-vs-engagement screen: a segment where balance and
    activity anticorrelate is buying on credit (collections risk);
    strong positive correlation marks the prepaid/deposit pattern.
    Customers with no orders count as zero activity (the spine is
    the customer dimension, not the fact table).

    Determinism (the discount_quantity_corr recipe): balances snap
    to integer cents per row — exact for 2-decimal money, including
    negatives (floor of x·100+0.5 is the same value both engines) —
    order counts are integers; five BIGINT moment sums; one shared
    sqrt/divide Pearson template.

    Plan: per-customer order counts (one fact agg), LEFT join onto
    the customer dim (broadcast of the AGGREGATED counts — the agg
    side is |customers-with-orders|, dim-bounded), |segments|-row
    moment agg.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr(
            "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("x"),
    )
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = (
        cust.join(
            F.broadcast(counts), cust.c_custkey == counts.o_custkey, "left"
        )
        .withColumn("y", F.expr("coalesce(n_orders, 0)"))
    )
    mom = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return (
        mom.where(
            "n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
        )
        .withColumn("corr_e6", F.expr(pearson_e6()))
        .select("c_mktsegment", "n", "sx", "sy", "corr_e6")
        .orderBy("c_mktsegment")
    )


BALANCE_ACTIVITY_CORR_SQL = f"""
WITH counts AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
), joined AS (
  SELECT c_mktsegment,
         CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS x,
         CAST(coalesce(n_orders, 0) AS BIGINT) AS y
  FROM customer LEFT JOIN counts ON c_custkey = o_custkey
), mom AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM joined GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, sx, sy, {pearson_e6()} AS corr_e6
FROM mom
WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Round 7: price-volume-mix revenue bridge
# ---------------------------------------------------------------------------

def revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FP&A revenue bridge: each year's revenue change
    decomposed into a VOLUME effect (quantity change at last year's
    realized unit price), a PRICE effect (this year's quantity at
    the unit-price change), and an explicit RESIDUAL that makes the
    identity exact — Δrev = volume + price + residual, enforced by
    construction rather than approximated away (the residual IS the
    price·volume interaction plus integer-DIV remainder, and
    reporting it beats silently mis-attributing it). revenue_yoy
    gives the headline growth; this says WHY.

    Integer-exact: revenue in cents, quantities in units, realized
    unit prices via integer DIV (cents per unit) — deterministic,
    and the residual column absorbs every truncation by identity.

    Plan: one partial agg to |years| rows; lag windows and the
    decomposition ride the tiny relation (SinglePartition).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("year(l_shipdate)").alias("yr"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) "
            "* 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    yearly = li.groupBy("yr").agg(
        F.sum("qty").alias("qty"),
        F.sum("cents").alias("rev_cents"),
    )
    lagged = (
        yearly.withColumn(
            "prev_qty", F.expr("lag(qty) OVER (ORDER BY yr)")
        )
        .withColumn(
            "prev_rev", F.expr("lag(rev_cents) OVER (ORDER BY yr)")
        )
        .where("prev_qty IS NOT NULL AND prev_qty > 0 AND qty > 0")
    )
    return (
        lagged.withColumn("prev_unit", F.expr("prev_rev DIV prev_qty"))
        .withColumn("unit", F.expr("rev_cents DIV qty"))
        .withColumn(
            "volume_effect", F.expr("(qty - prev_qty) * prev_unit")
        )
        .withColumn("price_effect", F.expr("qty * (unit - prev_unit)"))
        .withColumn(
            "residual",
            F.expr(
                "(rev_cents - prev_rev) "
                "- (qty - prev_qty) * prev_unit - qty * (unit - prev_unit)"
            ),
        )
        .select(
            "yr", "qty", "rev_cents", "prev_rev",
            "volume_effect", "price_effect", "residual",
        )
        .orderBy("yr")
    )


REVENUE_BRIDGE_SQL = """
WITH yearly AS (
  SELECT year(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(floor(l_extendedprice
           * (CAST(1 AS DOUBLE) - l_discount)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1
), lagged AS (
  SELECT yr, qty, rev_cents,
         lag(qty) OVER (ORDER BY yr) AS prev_qty,
         lag(rev_cents) OVER (ORDER BY yr) AS prev_rev
  FROM yearly
), m AS (
  SELECT yr, qty, rev_cents, prev_rev,
         prev_rev // prev_qty AS prev_unit,
         rev_cents // qty AS unit,
         prev_qty
  FROM lagged
  WHERE prev_qty IS NOT NULL AND prev_qty > 0 AND qty > 0
)
SELECT yr, qty, rev_cents, prev_rev,
       (qty - prev_qty) * prev_unit AS volume_effect,
       qty * (unit - prev_unit) AS price_effect,
       (rev_cents - prev_rev) - (qty - prev_qty) * prev_unit
         - qty * (unit - prev_unit) AS residual
FROM m
ORDER BY yr
"""


# ---------------------------------------------------------------------------
# Round 8: calendar-adjusted month-of-year index
# ---------------------------------------------------------------------------

def calendar_adjusted_monthly_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue index ADJUSTED for calendar length —
    seasonal_index divides by nothing, so February reads ~10 %
    "slower" purely because it is short; here each pooled month is
    normalized by its actual day count (per (year, month), summed
    across years) and indexed against the global revenue-per-day:
    index 10000 = a flat daily rate. The report that separates real
    seasonality from calendar arithmetic.

    Integer-exact: per-order cents, day counts from last_day()
    (both engines' native calendar), integer DIVs shared verbatim.

    Plan: one (year, month) partial agg over orders (≤ 12·|years|
    rows, carrying days-in-month by max — constant per group), one
    12-row re-aggregate; the global rate rides a window over those
    12 rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("year(o_orderdate)").alias("yr"),
        F.expr("month(o_orderdate)").alias("mon"),
        F.expr("CAST(day(last_day(o_orderdate)) AS BIGINT)").alias("dim"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    ym = orders.groupBy("yr", "mon").agg(
        F.sum("cents").alias("rev_cents"),
        F.max("dim").alias("dim"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        ym.groupBy("mon")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("dim").alias("days"),
        )
        .withColumn("rev_per_day", F.expr("rev_cents DIV days"))
        .withColumn(
            "index_bp",
            F.expr(
                "CAST((CAST(rev_per_day AS DECIMAL(38,0)) * 10000) DIV "
                "(SUM(rev_cents) OVER () DIV SUM(days) OVER ()) AS BIGINT)"
            ),
        )
        .select(
            "mon", "n_orders", "rev_cents", "days", "rev_per_day",
            "index_bp",
        )
        .orderBy("mon")
    )


CALENDAR_ADJUSTED_MONTHLY_INDEX_SQL = """
WITH o AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
         CAST(day(last_day(o_orderdate)) AS BIGINT) AS dim,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), ym AS (
  SELECT yr, mon, CAST(SUM(cents) AS BIGINT) AS rev_cents,
         MAX(dim) AS dim, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM o GROUP BY 1, 2
), m AS (
  SELECT mon, CAST(SUM(n_orders) AS BIGINT) AS n_orders,
         CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
         CAST(SUM(dim) AS BIGINT) AS days
  FROM ym GROUP BY 1
)
SELECT mon, n_orders, rev_cents, days,
       rev_cents // days AS rev_per_day,
       CAST((CAST(rev_cents // days AS HUGEINT) * 10000)
         // (CAST(SUM(rev_cents) OVER () AS BIGINT)
             // CAST(SUM(days) OVER () AS BIGINT)) AS BIGINT) AS index_bp
FROM m
ORDER BY mon
"""


# ---------------------------------------------------------------------------
# Round 8: inventory/backorder simulation (reflected-walk form)
# ---------------------------------------------------------------------------

def inventory_backorder_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly inventory simulation per part type: demand is shipped
    quantity per week, replenishment is a constant rate
    R = total ÷ weeks + 1, and the on-hand stock follows the
    RECURRENCE S_w = max(0, S_{w−1} + R − D_w) — which a plain
    cumulative window cannot express. The reflected-walk identity
    makes it one pass anyway: with C_w = Σ(R − D), the stock is
    S_w = C_w − min(0, running-min(C_w)), so two stacked windows
    over the weekly series replace the sequential loop — the trick
    that keeps a 100 TB simulation distributive instead of
    driver-sequential. Reports stockout weeks (weeks the walk sets
    a new sub-zero minimum — demand arrived to an empty shelf), the
    worst single-week unmet demand (how far below empty that week
    went: min(0, prev running-min) − C_w), and the ending stock —
    each pinned against a sequential Python replay of the
    recurrence in tests.

    Integer-exact: BIGINT quantities, integer R, window sums.

    Plan: lineitem×part broadcast join → (type, week) partial agg
    (≤ |types|·|weeks| rows); both windows and the final per-type
    fold run on that small series, partitioned by type."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(unix_timestamp(l_shipdate) / 604800) AS BIGINT)"
        ).alias("week"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    weekly = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_type", "week")
        .agg(F.sum("qty").alias("demand"))
    )
    rate = weekly.groupBy("p_type").agg(
        F.expr("SUM(demand) DIV COUNT(*) + 1").alias("restock"),
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum("demand").alias("total_demand"),
    )
    walk = (
        weekly.join(F.broadcast(rate), "p_type")
        .withColumn(
            "c",
            F.expr(
                "SUM(restock - demand) OVER (PARTITION BY p_type "
                "ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND CURRENT ROW)"
            ),
        )
        .withColumn(
            "runmin",
            F.expr(
                "MIN(c) OVER (PARTITION BY p_type ORDER BY week "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ),
        )
        .withColumn("stock", F.expr("c - least(runmin, 0)"))
        .withColumn(
            "prev_runmin",
            F.expr(
                "lag(runmin) OVER (PARTITION BY p_type ORDER BY week)"
            ),
        )
    )
    return (
        walk.groupBy("p_type")
        .agg(
            F.max("n_weeks").alias("n_weeks"),
            F.max("restock").alias("restock_per_week"),
            F.max("total_demand").alias("total_demand"),
            F.sum(
                F.expr(
                    "CASE WHEN c < 0 AND (prev_runmin IS NULL "
                    "OR c < prev_runmin) THEN 1 ELSE 0 END"
                )
            ).alias("stockout_weeks"),
            F.expr(
                "CAST(coalesce(MAX(greatest(least(coalesce(prev_runmin, "
                "0), 0) - c, 0)), 0) AS BIGINT)"
            ).alias("max_deficit"),
            F.expr("MAX_BY(stock, week)").alias("end_stock"),
        )
        .orderBy("p_type")
    )


INVENTORY_BACKORDER_SIM_SQL = """
WITH weekly AS (
  SELECT p.p_type,
         CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS week,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), rate AS (
  SELECT p_type,
         CAST(SUM(demand) AS BIGINT) // CAST(COUNT(*) AS BIGINT) + 1
           AS restock,
         CAST(COUNT(*) AS BIGINT) AS n_weeks,
         CAST(SUM(demand) AS BIGINT) AS total_demand
  FROM weekly GROUP BY 1
), walk AS (
  SELECT w.p_type, w.week, r.restock, r.n_weeks, r.total_demand,
         CAST(SUM(r.restock - w.demand) OVER (PARTITION BY w.p_type
           ORDER BY w.week ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS c
  FROM weekly w JOIN rate r ON w.p_type = r.p_type
), walk1 AS (
  SELECT p_type, week, restock, n_weeks, total_demand, c,
         CAST(MIN(c) OVER (PARTITION BY p_type ORDER BY week
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS runmin
  FROM walk
), walk2 AS (
  SELECT p_type, week, restock, n_weeks, total_demand, c, runmin,
         lag(runmin) OVER (PARTITION BY p_type ORDER BY week)
           AS prev_runmin
  FROM walk1
)
SELECT p_type,
       CAST(MAX(n_weeks) AS BIGINT) AS n_weeks,
       CAST(MAX(restock) AS BIGINT) AS restock_per_week,
       CAST(MAX(total_demand) AS BIGINT) AS total_demand,
       CAST(SUM(CASE WHEN c < 0 AND (prev_runmin IS NULL
         OR c < prev_runmin) THEN 1 ELSE 0 END) AS BIGINT)
         AS stockout_weeks,
       CAST(COALESCE(MAX(greatest(least(COALESCE(prev_runmin, 0), 0)
         - c, 0)), 0) AS BIGINT) AS max_deficit,
       CAST(max_by(c - least(runmin, 0), week) AS BIGINT) AS end_stock
FROM walk2
GROUP BY p_type
ORDER BY p_type
"""


# ---------------------------------------------------------------------------
# Round 8: reorder-point report (robust demand quantiles)
# ---------------------------------------------------------------------------

def reorder_point_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part type: the P90/P50 of WEEKLY shipped demand and the
    implied reorder point + safety stock (P90 as the
    order-up-to level, P90 − P50 as the buffer above typical
    demand) — the inventory-policy companion to
    inventory_backorder_sim: the sim says what a flat restock rate
    does; this says what rate to set.

    Determinism: weekly demands are BIGINT; quantiles use the
    verified interpolated-percentile contract at ×10 (P90) and ×2
    (P50) fixed-point so the interpolation is integral in both
    engines.

    Plan: the same (type, week) partial agg as the sim, then ONE
    |types|-row percentile aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(unix_timestamp(l_shipdate) / 604800) AS BIGINT)"
        ).alias("week"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    weekly = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_type", "week")
        .agg(F.sum("qty").alias("demand"))
    )
    return (
        weekly.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_weeks"),
            F.sum("demand").alias("total_demand"),
            F.expr(
                "CAST(percentile(demand * 10, CAST(0.9 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("p90_x10"),
            F.expr(
                "CAST(percentile(demand * 2, CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("p50_x2"),
        )
        .select(
            "p_type",
            "n_weeks",
            "total_demand",
            F.expr("p90_x10 DIV 10").alias("reorder_point"),
            F.expr("p50_x2 DIV 2").alias("typical_demand"),
            F.expr("p90_x10 DIV 10 - p50_x2 DIV 2").alias("safety_stock"),
        )
        .orderBy("p_type")
    )


REORDER_POINT_REPORT_SQL = """
WITH weekly AS (
  SELECT p.p_type,
         CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS week,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), q AS (
  SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_weeks,
         CAST(SUM(demand) AS BIGINT) AS total_demand,
         CAST(quantile_cont(demand * 10, CAST(0.9 AS DOUBLE)) AS BIGINT)
           AS p90_x10,
         CAST(quantile_cont(demand * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS p50_x2
  FROM weekly GROUP BY 1
)
SELECT p_type, n_weeks, total_demand,
       p90_x10 // 10 AS reorder_point,
       p50_x2 // 2 AS typical_demand,
       p90_x10 // 10 - p50_x2 // 2 AS safety_stock
FROM q
ORDER BY p_type
"""


# ---------------------------------------------------------------------------
# Round 8: LTV cohort triangle
# ---------------------------------------------------------------------------

def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTV cohort triangle: customers grouped by FIRST-order
    month, revenue tracked by month offset since that first order,
    cumulative per cohort, and LTV-per-customer at each age — the
    curve every acquisition-payback decision reads. One query, no
    sessionization: cohort assignment is a per-customer MIN.

    Integer-exact: month indexes are year·12+month ints, revenue in
    cents, the per-customer LTV one integer DIV.

    Plan: per-customer first-month agg (customer-keyed partial
    agg), broadcast back onto orders (dim-sized — |customers| ≪
    orders at scale it stays a shuffle-hash join on o_custkey, the
    same key the agg just used), then a (cohort, offset) agg of ≤
    |months|² rows; the cumulative window runs per cohort on that
    triangle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(o_orderdate) * 12 + month(o_orderdate) - 1"
        ).alias("m"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    # localCheckpoint (r11, guide §3.3): the cohort spine feeds sizes
    # AND the triangle join — uncheckpointed, the orders scan +
    # per-customer min ran twice (4 parquet scans in the plan).
    first = orders.groupBy("o_custkey").agg(
        F.min("m").alias("m0")
    ).localCheckpoint()
    sizes = first.groupBy("m0").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    tri = (
        orders.join(first, "o_custkey")
        .groupBy(
            F.col("m0").alias("cohort"),
            F.expr("m - m0").alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum("cents").alias("rev_cents"),
        )
    )
    return (
        tri.join(
            F.broadcast(sizes.select(F.col("m0").alias("cohort"),
                                     "cohort_size")),
            "cohort",
        )
        .withColumn(
            "cum_rev_cents",
            F.expr(
                "SUM(rev_cents) OVER (PARTITION BY cohort "
                "ORDER BY age_months ROWS BETWEEN UNBOUNDED PRECEDING "
                "AND CURRENT ROW)"
            ),
        )
        .withColumn(
            "ltv_cents", F.expr("cum_rev_cents DIV cohort_size")
        )
        .select(
            "cohort", "age_months", "cohort_size", "active_customers",
            "rev_cents", "cum_rev_cents", "ltv_cents",
        )
        .orderBy("cohort", "age_months")
    )


CUSTOMER_LTV_COHORTS_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), first AS (
  SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1
), sizes AS (
  SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1
), tri AS (
  SELECT f.m0 AS cohort, o.m - f.m0 AS age_months,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
         CAST(SUM(o.cents) AS BIGINT) AS rev_cents
  FROM o JOIN first f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT t.cohort, t.age_months, s.cohort_size, t.active_customers,
         t.rev_cents,
         CAST(SUM(t.rev_cents) OVER (PARTITION BY t.cohort
           ORDER BY t.age_months ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS cum_rev_cents
  FROM tri t JOIN sizes s ON t.cohort = s.m0
)
SELECT cohort, age_months, cohort_size, active_customers, rev_cents,
       cum_rev_cents, cum_rev_cents // cohort_size AS ltv_cents
FROM cum
ORDER BY cohort, age_months
"""


# ---------------------------------------------------------------------------
# Round 8: cohort repeat rate
# ---------------------------------------------------------------------------

def cohort_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per acquisition cohort (first-order month): how many
    customers came back for a SECOND order within 6 months — the
    single scalar the LTV triangle gets asked to summarize. Also
    reports the median months-to-second-order among repeaters.

    Integer-exact: month indexes, counts, one DIV for the bp rate;
    the median uses the ×2 fixed-point percentile contract.

    Plan: per-customer agg computing first and second order months
    in ONE pass (min + the min-above-min via a conditional min over
    a window-free second agg), then a |cohorts|-row rollup."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(o_orderdate) * 12 + month(o_orderdate) - 1"
        ).alias("m"),
    )
    # localCheckpoint (r11, guide §3.3): per_cust feeds the
    # second-order probe AND the left join — uncheckpointed, the
    # orders scan + per-customer agg ran twice.
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("m").alias("m0"), F.count(F.lit(1)).alias("n_orders")
    ).localCheckpoint()
    second = (
        orders.join(per_cust, "o_custkey")
        .where("m > m0")
        .groupBy("o_custkey")
        .agg(F.min("m").alias("m1"))
    )
    cust = per_cust.join(second, "o_custkey", "left")
    return (
        cust.groupBy(F.col("m0").alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("cohort_size"),
            F.sum(
                F.expr(
                    "CASE WHEN m1 IS NOT NULL AND m1 - m0 <= 6 "
                    "THEN 1 ELSE 0 END"
                )
            ).alias("repeaters_6m"),
            F.expr(
                "CAST(percentile(CASE WHEN m1 IS NOT NULL THEN "
                "(m1 - m0) * 2 END, CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("med_gap_x2"),
        )
        .select(
            "cohort",
            "cohort_size",
            "repeaters_6m",
            F.expr("(repeaters_6m * 10000) DIV cohort_size").alias(
                "repeat_bp"
            ),
            F.expr("med_gap_x2 DIV 2").alias("median_months_to_second"),
        )
        .orderBy("cohort")
    )


COHORT_REPEAT_RATE_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
), per_cust AS (
  SELECT o_custkey, MIN(m) AS m0, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM o GROUP BY 1
), second AS (
  SELECT o.o_custkey, MIN(o.m) AS m1
  FROM o JOIN per_cust p ON o.o_custkey = p.o_custkey
  WHERE o.m > p.m0
  GROUP BY 1
), cust AS (
  SELECT p.o_custkey, p.m0, s.m1
  FROM per_cust p LEFT JOIN second s ON p.o_custkey = s.o_custkey
)
SELECT m0 AS cohort,
       CAST(COUNT(*) AS BIGINT) AS cohort_size,
       CAST(SUM(CASE WHEN m1 IS NOT NULL AND m1 - m0 <= 6
         THEN 1 ELSE 0 END) AS BIGINT) AS repeaters_6m,
       (CAST(SUM(CASE WHEN m1 IS NOT NULL AND m1 - m0 <= 6
         THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         // CAST(COUNT(*) AS BIGINT) AS repeat_bp,
       CAST(quantile_cont(CASE WHEN m1 IS NOT NULL THEN (m1 - m0) * 2 END,
         CAST(0.5 AS DOUBLE)) AS BIGINT) // 2
         AS median_months_to_second
FROM cust
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Round 8: nation trade balance
# ---------------------------------------------------------------------------

def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: revenue SUPPLIED (lineitem value through that
    nation's suppliers) versus revenue CONSUMED (order value by that
    nation's customers) and the net balance — the two-sided exposure
    view nation_trade_lift's graph edges aggregate away. A nation
    that supplies far more than it buys is a concentration risk on
    the supply side; the rank makes the tails reviewable.

    Integer-exact: cents on both sides, one subtraction, rank with
    full tie-break.

    Plan: two independent fact aggregations (lineitem keyed by
    suppkey, orders keyed by custkey), each with its dim broadcast
    (supplier/customer/nation are all dim-sized); FULL join of two
    |nations|-row results, rank over ≤ 25 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nationkey"),
    )
    supplied = (
        li.join(F.broadcast(sup), "l_suppkey")
        .groupBy("nationkey")
        .agg(F.sum("cents").alias("supplied_cents"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    consumed = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("nationkey")
        .agg(F.sum("cents").alias("consumed_cents"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    return (
        nation.join(F.broadcast(supplied), "nationkey", "left")
        .join(F.broadcast(consumed), "nationkey", "left")
        .select(
            "n_name",
            F.expr("coalesce(supplied_cents, CAST(0 AS BIGINT))").alias(
                "supplied_cents"
            ),
            F.expr("coalesce(consumed_cents, CAST(0 AS BIGINT))").alias(
                "consumed_cents"
            ),
        )
        .withColumn(
            "net_cents", F.expr("supplied_cents - consumed_cents")
        )
        .withColumn(
            "net_rank",
            F.expr(
                "row_number() OVER (ORDER BY supplied_cents "
                "- consumed_cents DESC, n_name)"
            ),
        )
        .orderBy("n_name")
    )


NATION_TRADE_BALANCE_SQL = """
WITH supplied AS (
  SELECT s.s_nationkey AS nationkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS supplied_cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1
), consumed AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(SUM(CAST(floor(o_totalprice * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS consumed_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
), base AS (
  SELECT n.n_name,
         COALESCE(s.supplied_cents, 0) AS supplied_cents,
         COALESCE(c.consumed_cents, 0) AS consumed_cents
  FROM nation n
  LEFT JOIN supplied s ON n.n_nationkey = s.nationkey
  LEFT JOIN consumed c ON n.n_nationkey = c.nationkey
)
SELECT n_name, supplied_cents, consumed_cents,
       supplied_cents - consumed_cents AS net_cents,
       CAST(row_number() OVER (ORDER BY supplied_cents - consumed_cents
         DESC, n_name) AS BIGINT) AS net_rank
FROM base
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Round 8: Pareto concentration of revenue within part types
# ---------------------------------------------------------------------------

def parts_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 audit per part type: how many of the type's parts
    carry 80 % of its revenue, plus the top part's share (bp) —
    part_supply_concentration's HHI says "concentrated or not";
    this answers the operational form: how short is the list you
    must protect. A type where 5 % of parts reach the 80 % line
    prices its catalog like a hit business.

    Integer-exact: cents, cumulative BIGINT window with
    (revenue DESC, partkey) total order, integer-DIV thresholds.

    Plan: per-(type, part) partial agg (one exchange on the fact),
    then windows partitioned by type over |parts| rows, folded to
    |types| rows. No join at all — p_type rides in via broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    per_part = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("p_type", "l_partkey")
        .agg(F.sum("cents").alias("rev"))
    )
    ranked = per_part.select(
        "p_type",
        "rev",
        F.expr(
            "SUM(rev) OVER (PARTITION BY p_type ORDER BY rev DESC, "
            "l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("cum_rev"),
        F.expr("SUM(rev) OVER (PARTITION BY p_type)").alias("total_rev"),
        F.expr(
            "row_number() OVER (PARTITION BY p_type ORDER BY rev DESC, "
            "l_partkey)"
        ).alias("rk"),
    )
    return (
        ranked.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.max("total_rev").alias("rev_cents"),
            F.min(
                F.expr(
                    "CASE WHEN cum_rev * 10 >= total_rev * 8 THEN rk END"
                )
            ).alias("parts_to_80pct"),
            F.max(
                F.expr("CASE WHEN rk = 1 THEN (rev * 10000) DIV total_rev END")
            ).alias("top_part_share_bp"),
        )
        .withColumn(
            "pareto_bp", F.expr("(parts_to_80pct * 10000) DIV n_parts")
        )
        .orderBy("p_type")
    )


PARTS_PARETO_CONCENTRATION_SQL = """
WITH per_part AS (
  SELECT p.p_type, l.l_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_type, rev,
         CAST(SUM(rev) OVER (PARTITION BY p_type ORDER BY rev DESC,
           l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_rev,
         CAST(SUM(rev) OVER (PARTITION BY p_type) AS BIGINT) AS total_rev,
         CAST(row_number() OVER (PARTITION BY p_type ORDER BY rev DESC,
           l_partkey) AS BIGINT) AS rk
  FROM per_part
), agg AS (
  SELECT p_type,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(MAX(total_rev) AS BIGINT) AS rev_cents,
         CAST(MIN(CASE WHEN cum_rev * 10 >= total_rev * 8 THEN rk END)
           AS BIGINT) AS parts_to_80pct,
         CAST(MAX(CASE WHEN rk = 1 THEN (rev * 10000) // total_rev END)
           AS BIGINT) AS top_part_share_bp
  FROM ranked GROUP BY 1
)
SELECT p_type, n_parts, rev_cents, parts_to_80pct, top_part_share_bp,
       (parts_to_80pct * 10000) // n_parts AS pareto_bp
FROM agg
ORDER BY p_type
"""


# ---------------------------------------------------------------------------
# Round 8: brand price dispersion
# ---------------------------------------------------------------------------

def part_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog pricing spread per brand: min/max retail price, the
    interquartile range, and IQR relative to the median (bp) — the
    assortment-architecture report (a brand with a tight IQR is a
    single price tier; a wide one straddles segments). Sits beside
    part_type_margin: that prices the SALES, this prices the
    CATALOG.

    Determinism: prices in cents; quartiles via the ×4 fixed-point
    interpolated-percentile contract (0.25/0.75 on BIGINTs ×4 are
    integral in both engines).

    Plan: part only (dim-sized) — one |brands|-row aggregate."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.expr(
            "CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            # One percentile buffer for the two ×4 quartiles (r11,
            # the quantile_summary precedent — bit-identical).
            F.expr(
                "percentile(cents * 4, array(CAST(0.25 AS DOUBLE), "
                "CAST(0.75 AS DOUBLE)))"
            ).alias("qq_x4"),
            F.expr(
                "CAST(percentile(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("med_x2"),
        )
        .select(
            "p_brand",
            "n_parts",
            "min_cents",
            "max_cents",
            F.expr("med_x2 DIV 2").alias("median_cents"),
            F.expr(
                "(CAST(qq_x4[1] AS BIGINT) - CAST(qq_x4[0] AS BIGINT)) DIV 4"
            ).alias("iqr_cents"),
            F.expr(
                "(((CAST(qq_x4[1] AS BIGINT) - CAST(qq_x4[0] AS BIGINT)) "
                "DIV 4) * 10000) DIV (med_x2 DIV 2)"
            ).alias("iqr_over_median_bp"),
        )
        .orderBy("p_brand")
    )


PART_BRAND_PRICE_DISPERSION_SQL = """
WITH p AS (
  SELECT p_brand,
         CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM part
), q AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(MIN(cents) AS BIGINT) AS min_cents,
         CAST(MAX(cents) AS BIGINT) AS max_cents,
         CAST(quantile_cont(cents * 4, CAST(0.25 AS DOUBLE)) AS BIGINT)
           AS q1_x4,
         CAST(quantile_cont(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS med_x2,
         CAST(quantile_cont(cents * 4, CAST(0.75 AS DOUBLE)) AS BIGINT)
           AS q3_x4
  FROM p GROUP BY 1
)
SELECT p_brand, n_parts, min_cents, max_cents,
       med_x2 // 2 AS median_cents,
       (q3_x4 - q1_x4) // 4 AS iqr_cents,
       (((q3_x4 - q1_x4) // 4) * 10000) // (med_x2 // 2)
         AS iqr_over_median_bp
FROM q
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Round 8: order-priority mix by month (dense grid)
# ---------------------------------------------------------------------------

def orders_priority_mix_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix per calendar month (pooled across years)
    on a DENSE priority × month grid — zero-count cells included
    (the r7 sparse-grid lesson: a priority that vanishes from a
    month IS the drift), with each cell's share (bp) of its month
    and the gap to that priority's overall share. The SLA-mix
    monitor: a creeping URGENT share is an ops cost signal long
    before the queue backs up.

    Integer-exact: counts, two integer DIVs on the shared grid.

    Plan: one (month, priority) partial agg (≤ 60 cells), dense
    grid by cross join of two tiny distinct sets, overall shares by
    window over those cells."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("month(o_orderdate)").alias("mon"), "o_orderpriority"
    )
    cells = orders.groupBy("mon", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = (
        cells.select("mon").distinct()
        .crossJoin(cells.select("o_orderpriority").distinct())
    )
    dense = grid.join(cells, ["mon", "o_orderpriority"], "left").select(
        "mon",
        "o_orderpriority",
        F.expr("coalesce(n, CAST(0 AS BIGINT))").alias("n_orders"),
    )
    return (
        dense.withColumn(
            "mon_total",
            F.expr("SUM(n_orders) OVER (PARTITION BY mon)"),
        )
        .withColumn(
            "prio_total",
            F.expr("SUM(n_orders) OVER (PARTITION BY o_orderpriority)"),
        )
        .withColumn("grand", F.expr("SUM(n_orders) OVER ()"))
        .select(
            "mon",
            "o_orderpriority",
            "n_orders",
            F.expr("(n_orders * 10000) DIV mon_total").alias("share_bp"),
            F.expr(
                "(n_orders * 10000) DIV mon_total "
                "- (prio_total * 10000) DIV grand"
            ).alias("vs_overall_bp"),
        )
        .orderBy("mon", "o_orderpriority")
    )


ORDERS_PRIORITY_MIX_BY_MONTH_SQL = """
WITH cells AS (
  SELECT month(o_orderdate) AS mon, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), grid AS (
  SELECT m.mon, p.o_orderpriority
  FROM (SELECT DISTINCT mon FROM cells) m
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM cells) p
), dense AS (
  SELECT g.mon, g.o_orderpriority, COALESCE(c.n, 0) AS n_orders
  FROM grid g LEFT JOIN cells c
    ON g.mon = c.mon AND g.o_orderpriority = c.o_orderpriority
), tot AS (
  SELECT mon, o_orderpriority, n_orders,
         CAST(SUM(n_orders) OVER (PARTITION BY mon) AS BIGINT)
           AS mon_total,
         CAST(SUM(n_orders) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS prio_total,
         CAST(SUM(n_orders) OVER () AS BIGINT) AS grand
  FROM dense
)
SELECT mon, o_orderpriority, n_orders,
       (n_orders * 10000) // mon_total AS share_bp,
       (n_orders * 10000) // mon_total
         - (prio_total * 10000) // grand AS vs_overall_bp
FROM tot
ORDER BY mon, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Round 8: discount effectiveness
# ---------------------------------------------------------------------------

def lineitem_discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per discount band (percentage points) and return flag: line
    count, net revenue, average quantity (×100 fixed-point), and
    the return share (bp) of each band — the promo-effectiveness
    cut: if deeper discounts ship barely more units per line while
    the R (returned) share stays flat, the discount buys nothing.

    Integer-exact: bands are floor(discount·100) ints, cents,
    fixed-point average, one DIV per share.

    Plan: map-only banding → one (band, flag) partial agg
    (≤ 11·3 cells); the band totals ride a window over those
    cells."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("disc_pct"),
        "l_returnflag",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    return (
        li.groupBy("disc_pct", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("rev_cents"),
            F.sum("qty").alias("total_qty"),
        )
        .withColumn(
            "avg_qty_x100", F.expr("(total_qty * 100) DIV n_lines")
        )
        .withColumn(
            "band_share_bp",
            F.expr(
                "(n_lines * 10000) DIV SUM(n_lines) "
                "OVER (PARTITION BY disc_pct)"
            ),
        )
        .orderBy("disc_pct", "l_returnflag")
    )


LINEITEM_DISCOUNT_EFFECTIVENESS_SQL = """
WITH li AS (
  SELECT CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS disc_pct,
         l_returnflag,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM lineitem
), agg AS (
  SELECT disc_pct, l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(cents) AS BIGINT) AS rev_cents,
         CAST(SUM(qty) AS BIGINT) AS total_qty
  FROM li GROUP BY 1, 2
)
SELECT disc_pct, l_returnflag, n_lines, rev_cents, total_qty,
       (total_qty * 100) // n_lines AS avg_qty_x100,
       (n_lines * 10000) // CAST(SUM(n_lines)
         OVER (PARTITION BY disc_pct) AS BIGINT) AS band_share_bp
FROM agg
ORDER BY disc_pct, l_returnflag
"""


# ---------------------------------------------------------------------------
# Round 8: supplier balance deciles
# ---------------------------------------------------------------------------

def supplier_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance deciles: NTILE(10) over balance
    cents (suppkey tie-break — NTILE is only deterministic under a
    TOTAL order), per decile the supplier count, balance range, and
    share of the aggregate positive balance (bp) — the
    credit-exposure ladder: decile 1's negative tail is the
    watchlist, decile 10's share says how top-heavy the float is.

    Plan: supplier only: the decile comes from the two-phase
    boundary-broadcast tiling primitive (operators/tiling.py) — a
    per-bucket rank + broadcast offsets, bit-identical to
    ``ntile(10) OVER (ORDER BY cents, s_suppkey)`` but with no
    SF-growing relation through a SinglePartition window (supplier
    is ~10⁹ rows at TPC-H 100×); then one 10-row aggregate."""
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntile

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(
            "CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    tiled = with_global_ntile(
        sup, "cents", "s_suppkey", 10, "decile",
        cache_ns="supplier_balance_deciles",
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
            F.sum(
                F.expr("CASE WHEN cents > 0 THEN cents ELSE 0 END")
            ).alias("pos_cents"),
        )
        .withColumn(
            "pos_share_bp",
            F.expr(
                "CAST((CAST(pos_cents AS DECIMAL(38,0)) * 10000) DIV "
                "SUM(pos_cents) OVER () AS BIGINT)"
            ),
        )
        .orderBy("decile")
    )


SUPPLIER_BALANCE_DECILES_SQL = """
WITH tiled AS (
  SELECT CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents,
         CAST(ntile(10) OVER (ORDER BY
           CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT),
           s_suppkey) AS INTEGER) AS decile
  FROM supplier
), agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(MIN(cents) AS BIGINT) AS min_cents,
         CAST(MAX(cents) AS BIGINT) AS max_cents,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(SUM(CASE WHEN cents > 0 THEN cents ELSE 0 END) AS BIGINT)
           AS pos_cents
  FROM tiled GROUP BY 1
)
SELECT decile, n_suppliers, min_cents, max_cents, sum_cents, pos_cents,
       CAST((CAST(pos_cents AS HUGEINT) * 10000)
            // SUM(pos_cents) OVER () AS BIGINT) AS pos_share_bp
FROM agg
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Round 8 (batch 6): catalog type × brand matrix
# ---------------------------------------------------------------------------

def part_type_brand_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog assortment matrix: per (type, brand) cell, part count,
    share of the type (bp), and lift versus the brand's overall
    catalog share (bp ratio ×10⁴ scaled) — does brand B specialize
    in type T or spread evenly? segment_brand_affinity asks this of
    SALES; this asks it of the CATALOG, so the two together separate
    assortment strategy from demand.

    Plan: part only (dim-sized): one (type, brand) agg, share
    windows over ≤ |types|·|brands| cells."""
    part = load_table(spark, sf_dir, "part")
    cells = part.groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    return (
        cells.withColumn(
            "type_total", F.expr("SUM(n_parts) OVER (PARTITION BY p_type)")
        )
        .withColumn(
            "brand_total",
            F.expr("SUM(n_parts) OVER (PARTITION BY p_brand)"),
        )
        .withColumn("grand", F.expr("SUM(n_parts) OVER ()"))
        .select(
            "p_type",
            "p_brand",
            "n_parts",
            F.expr("(n_parts * 10000) DIV type_total").alias(
                "share_of_type_bp"
            ),
            F.expr(
                "((n_parts * 10000) DIV type_total) * 10000 "
                "DIV ((brand_total * 10000) DIV grand)"
            ).alias("lift_bp"),
        )
        .orderBy("p_type", "p_brand")
    )


PART_TYPE_BRAND_MATRIX_SQL = """
WITH cells AS (
  SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1, 2
), tot AS (
  SELECT p_type, p_brand, n_parts,
         CAST(SUM(n_parts) OVER (PARTITION BY p_type) AS BIGINT)
           AS type_total,
         CAST(SUM(n_parts) OVER (PARTITION BY p_brand) AS BIGINT)
           AS brand_total,
         CAST(SUM(n_parts) OVER () AS BIGINT) AS grand
  FROM cells
)
SELECT p_type, p_brand, n_parts,
       (n_parts * 10000) // type_total AS share_of_type_bp,
       ((n_parts * 10000) // type_total) * 10000
         // ((brand_total * 10000) // grand) AS lift_bp
FROM tot
ORDER BY p_type, p_brand
"""


# ---------------------------------------------------------------------------
# Round 8 (batch 6): supplier catalog coverage
# ---------------------------------------------------------------------------

def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: how much of the catalog they actually ship —
    distinct parts and distinct part TYPES shipped (from lineitem),
    type coverage share (bp of all types), and revenue — the
    single-supplier-dependency view from the supplier side
    (part_supply_concentration views it from the part side).

    Plan (r11 rewrite, guide §2.3 "aggregate before you shuffle" /
    §3.3 "explode before a join multiplies the shuffle" dual): the
    old shape broadcast-joined part onto RAW lineitem and ran a
    DOUBLE-distinct agg — an Expand ×2 of the whole joined fact
    (1.2 M rows at sf0.1, 12 B at 100 TB) through a 4-key partial
    agg. But p_type is FK-determined by l_partkey, so the fact can
    be reduced to distinct (suppkey, partkey) pairs FIRST (the
    spread exchange doubles as the pair-agg exchange — same keys),
    the part join probes |pairs| instead of |lineitem| rows, and
    the per-supplier rollup needs only a SINGLE-distinct agg on the
    pair lattice (no Expand anywhere). n_parts = COUNT(*) over
    pairs, n_lines/rev_cents = BIGINT sums reassociated over the
    same partition — exact. At sf0.1 the matched interleaved A/B is
    a tie (1.63 vs 1.72 min-of-9 under heavy host steal) — the win
    is the 100 TB shape: the Expand doubling of the joined fact is
    gone and the dim join probes |distinct pairs| (~1/7.5 of
    lineitem) instead of every line. The catalog type count stays a
    1-row broadcast."""
    li = load_spread(spark, sf_dir, "lineitem", "l_suppkey", "l_partkey").select(
        "l_suppkey",
        "l_partkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    catalog_types = part.agg(
        F.countDistinct("p_type").alias("catalog_types")
    )
    pairs = li.groupBy("l_suppkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("n_pp"),
        F.sum("cents").alias("cents_pp"),
    )
    per_supp = (
        pairs.join(F.broadcast(part), "l_partkey")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
            F.sum("n_pp").alias("n_lines"),
            F.sum("cents_pp").alias("rev_cents"),
        )
    )
    return (
        per_supp.crossJoin(F.broadcast(catalog_types))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "n_parts",
            "n_types",
            F.expr("(n_types * 10000) DIV catalog_types").alias(
                "type_coverage_bp"
            ),
            "n_lines",
            "rev_cents",
        )
        .orderBy("s_suppkey")
    )


SUPPLIER_PART_COVERAGE_SQL = """
WITH per_supp AS (
  SELECT l.l_suppkey AS s_suppkey,
         CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
         CAST(COUNT(DISTINCT p.p_type) AS BIGINT) AS n_types,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT s_suppkey, n_parts, n_types,
       (n_types * 10000)
         // (SELECT CAST(COUNT(DISTINCT p_type) AS BIGINT) FROM part)
         AS type_coverage_bp,
       n_lines, rev_cents
FROM per_supp
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Round 8 (batch 6): balance-vs-spend joint deciles
# ---------------------------------------------------------------------------

def customer_balance_spend_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint distribution of account-balance quintile × lifetime-
    spend quintile — the full contingency table behind
    balance_activity_corr's single correlation number: the corner
    cells (low balance, high spend) are the credit-risk review
    queue. Customers with no orders take spend 0 (they are the
    point of the low-spend column, not droppable rows).

    Integer-exact: NTILE(5) under (cents, custkey) total orders on
    both axes; counts + one DIV per cell.

    Plan: per-customer spend agg, LEFT join from the customer dim
    (broadcast), two |customers|-row NTILE windows, a ≤ 25-cell
    rollup."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("bal_cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    spend = orders.groupBy("c_custkey").agg(
        F.sum("cents").alias("spend_cents")
    )
    joined = cust.join(spend, "c_custkey", "left").select(
        "c_custkey",
        "bal_cents",
        F.expr("coalesce(spend_cents, CAST(0 AS BIGINT))").alias(
            "spend_cents"
        ),
    )
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntiles

    tiled = with_global_ntiles(
        joined,
        [
            ("bal_cents", "c_custkey", 5, "bal_q", False),
            ("spend_cents", "c_custkey", 5, "spend_q", False),
        ],
        cache_ns="customer_balance_spend_matrix",
    )
    return (
        tiled.groupBy("bal_q", "spend_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn(
            "share_bp",
            F.expr("(n_customers * 10000) DIV SUM(n_customers) OVER ()"),
        )
        .orderBy("bal_q", "spend_q")
    )


CUSTOMER_BALANCE_SPEND_MATRIX_SQL = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1
), joined AS (
  SELECT c.c_custkey,
         CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS bal_cents,
         COALESCE(s.spend_cents, 0) AS spend_cents
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.c_custkey
), tiled AS (
  SELECT CAST(ntile(5) OVER (ORDER BY bal_cents, c_custkey) AS INTEGER)
           AS bal_q,
         CAST(ntile(5) OVER (ORDER BY spend_cents, c_custkey) AS INTEGER)
           AS spend_q
  FROM joined
), cells AS (
  SELECT bal_q, spend_q, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM tiled GROUP BY 1, 2
)
SELECT bal_q, spend_q, n_customers,
       (n_customers * 10000) // CAST(SUM(n_customers) OVER () AS BIGINT)
         AS share_bp
FROM cells
ORDER BY bal_q, spend_q
"""


# ---------------------------------------------------------------------------
# Round 9 (batch 1): calendar seasonality + pricing response
# ---------------------------------------------------------------------------

#: Fixed-date holidays for the derived calendar dimension
#: (month, day) — deterministic rules, no locale tables.
HOLIDAYS_MD = ((1, 1), (7, 4), (12, 25))


def holiday_revenue_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-join seasonality (r8 VERDICT #5): build a DERIVED
    calendar dimension spanning the order history — every date
    classified holiday / weekend / weekday by deterministic rules —
    and join revenue onto it, so per (year, day class) the report
    carries the CALENDAR-side day count alongside the fact-side
    order count: revenue-per-calendar-day is what separates "July 4
    is quiet" from "there is only one July 4". The dim-build-and-
    join shape is the point — at 100 TB the generated calendar is a
    few thousand rows broadcast against the fact scan, the cheapest
    dimension money can buy.

    Determinism: dates are exact; weekday via the epoch arithmetic
    contract ((days + 3) % 7, 0 = Monday — engine dayofweek() is
    0-vs-1-based across engines); cents fixed-point; shares by DIV.

    Plan: 1-row span agg → broadcast; exploded calendar (≤ |days|
    rows) broadcast-joined to orders; one (year, class) agg; share
    window over ≤ |years|·3 cells."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    span = orders.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    holiday = " OR ".join(
        f"(month(day) = {m} AND day(day) = {d})" for m, d in HOLIDAYS_MD
    )
    klass = (
        f"CASE WHEN {holiday} THEN 'holiday' "
        "WHEN (datediff(day, DATE '1970-01-01') + 3) % 7 >= 5 "
        "THEN 'weekend' ELSE 'weekday' END"
    )
    calendar = (
        span.select(
            F.explode(F.expr("sequence(d0, d1)")).alias("day")
        )
        .withColumn("day_class", F.expr(klass))
        .withColumn("year", F.year("day"))
    )
    per_day = orders.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )
    joined = calendar.join(per_day, "day", "left").groupBy(
        "year", "day_class"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(F.sum("n_orders"), F.lit(0)).cast("long").alias(
            "n_orders"
        ),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias(
            "revenue_cents"
        ),
    )
    return (
        joined.withColumn(
            "rev_per_day_cents", F.expr("revenue_cents DIV n_days")
        )
        .withColumn(
            "share_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000) DIV "
                "(SUM(revenue_cents) OVER (PARTITION BY year)) AS BIGINT)"
            ),
        )
        .select(
            "year", "day_class", "n_days", "n_orders", "revenue_cents",
            "rev_per_day_cents", "share_bp",
        )
        .orderBy("year", "day_class")
    )


HOLIDAY_REVENUE_CALENDAR_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o
), days AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
), calendar AS (
  SELECT day,
         CASE WHEN (month(day) = 1 AND day(day) = 1)
                OR (month(day) = 7 AND day(day) = 4)
                OR (month(day) = 12 AND day(day) = 25)
              THEN 'holiday'
              WHEN (datediff('day', DATE '1970-01-01', day) + 3) % 7 >= 5
              THEN 'weekend' ELSE 'weekday' END AS day_class,
         year(day) AS year
  FROM days
), per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM o GROUP BY 1
), cells AS (
  SELECT c.year, c.day_class,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(COALESCE(SUM(p.n_orders), 0) AS BIGINT) AS n_orders,
         CAST(COALESCE(SUM(p.cents), 0) AS BIGINT) AS revenue_cents
  FROM calendar c LEFT JOIN per_day p ON c.day = p.day
  GROUP BY 1, 2
)
SELECT year, day_class, n_days, n_orders, revenue_cents,
       revenue_cents // n_days AS rev_per_day_cents,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000) //
         SUM(revenue_cents) OVER (PARTITION BY year) AS BIGINT)
         AS share_bp
FROM cells
ORDER BY year, day_class
"""


def orders_weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality of ORDER value (the orders-side twin of
    events_dow_profile): per weekday, order count, revenue cents,
    and the flat-series-reads-10000 index (revenue·7·10⁴ ÷ total) —
    the staffing/capacity baseline.

    Weekday by the epoch arithmetic contract (0 = Monday). One
    partial agg to 7 rows; index over a 7-row window."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') + 3)"
            " % 7"
        ).alias("weekday"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        orders.groupBy("weekday")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .withColumn(
            "index_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 7 * 10000) "
                "DIV (SUM(revenue_cents) OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("weekday")
    )


ORDERS_WEEKDAY_INDEX_SQL = """
WITH o AS (
  SELECT (datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           + 3) % 7 AS weekday,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), agg AS (
  SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM o GROUP BY 1
)
SELECT weekday, n_orders, revenue_cents,
       CAST((CAST(revenue_cents AS HUGEINT) * 7 * 10000) //
         SUM(revenue_cents) OVER () AS BIGINT) AS index_bp
FROM agg
ORDER BY weekday
"""


def returns_rate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns trend: per ship month, line count, returned-line
    count and rate (bp), plus returned revenue share (bp) — the
    quality-of-fulfilment time series behind returned_customers'
    per-customer view. A rate drift is a supplier or carrier
    problem; a level jump pins the month it started.

    One partial agg over lineitem to |months| rows; rates by DIV."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format(
            F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM"
        ).alias("month"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("rev_cents"),
    )
    return (
        li.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("ret").cast("long").alias("returned_lines"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
            F.sum(
                F.when(F.col("ret") == 1, F.col("rev_cents")).otherwise(0)
            ).cast("long").alias("returned_cents"),
        )
        .withColumn(
            "return_rate_bp",
            F.expr("(returned_lines * 10000) DIV n_lines"),
        )
        .withColumn(
            "returned_rev_bp",
            F.expr(
                "CAST((CAST(returned_cents AS DECIMAL(38,0)) * 10000)"
                " DIV revenue_cents AS BIGINT)"
            ),
        )
        .orderBy("month")
    )


RETURNS_RATE_MONTHLY_SQL = """
WITH li AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev_cents
  FROM lineitem
), agg AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(ret) AS BIGINT) AS returned_lines,
         CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
         CAST(SUM(CASE WHEN ret = 1 THEN rev_cents ELSE 0 END) AS BIGINT)
           AS returned_cents
  FROM li GROUP BY 1
)
SELECT month, n_lines, returned_lines, revenue_cents, returned_cents,
       (returned_lines * 10000) // n_lines AS return_rate_bp,
       CAST((CAST(returned_cents AS HUGEINT) * 10000)
            // revenue_cents AS BIGINT) AS returned_rev_bp
FROM agg
ORDER BY month
"""


def discount_elasticity_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity per product type (r8 VERDICT #5): per
    (p_type, discount band 0 / 1-2 / 3-5 / 6+ pct), line count and
    average quantity (×100 fixed-point), plus the band's quantity
    LIFT vs the type's own zero-discount baseline (bp) — does a
    deeper discount actually move more units of this type, or just
    give margin away? discount_band_lift pools all types; the
    elasticity question is per-type because baselines differ.

    Determinism: whole-percent bands, quantities rounded to BIGINT,
    lift as one cross-multiplied DIV ((qty·n₀·10⁴) ÷ (n·qty₀) — no
    intermediate ratios to round).

    Plan: lineitem⋈part shuffle on partkey (both fact-sized at
    100 TB), partial agg to |types|·4 cells, zero-band baseline
    broadcast back (≤ |types| rows)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("pct"),
        F.expr(
            "CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    band = (
        "CASE WHEN pct = 0 THEN '0' WHEN pct <= 2 THEN '1-2' "
        "WHEN pct <= 5 THEN '3-5' ELSE '6+' END"
    )
    cells = (
        li.join(part, "l_partkey")
        .groupBy("p_type", F.expr(band).alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
        .withColumn(
            "avg_qty_x100", F.expr("(total_qty * 100) DIV n_lines")
        )
    )
    base = cells.where(F.col("band") == "0").select(
        "p_type",
        F.col("n_lines").alias("n0"),
        F.col("total_qty").alias("qty0"),
    )
    return (
        cells.join(F.broadcast(base), "p_type", "left")
        .withColumn(
            "lift_bp",
            F.expr(
                "CASE WHEN qty0 IS NULL OR qty0 = 0 THEN NULL "
                "ELSE (total_qty * n0 * 10000) DIV "
                "(CAST(n_lines AS BIGINT) * qty0) END"
            ).cast("long"),
        )
        .select(
            "p_type", "band", "n_lines", "total_qty", "avg_qty_x100",
            "lift_bp",
        )
        .orderBy("p_type", "band")
    )


DISCOUNT_ELASTICITY_BY_TYPE_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS pct,
         CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qty
  FROM lineitem
), cells AS (
  SELECT p.p_type,
         CASE WHEN pct = 0 THEN '0' WHEN pct <= 2 THEN '1-2'
              WHEN pct <= 5 THEN '3-5' ELSE '6+' END AS band,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(qty) AS BIGINT) AS total_qty
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1, 2
), with_avg AS (
  SELECT *, (total_qty * 100) // n_lines AS avg_qty_x100 FROM cells
), base AS (
  SELECT p_type, n_lines AS n0, total_qty AS qty0
  FROM cells WHERE band = '0'
)
SELECT w.p_type, w.band, w.n_lines, w.total_qty, w.avg_qty_x100,
       CAST(CASE WHEN b.qty0 IS NULL OR b.qty0 = 0 THEN NULL
            ELSE (w.total_qty * b.n0 * 10000) //
                 (CAST(w.n_lines AS BIGINT) * b.qty0) END AS BIGINT)
         AS lift_bp
FROM with_avg w LEFT JOIN base b ON w.p_type = b.p_type
ORDER BY w.p_type, w.band
"""


def segment_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value distribution per market segment: count, min/max,
    and the ×4/×2 fixed-point quartile ladder of order totals — the
    pricing-page view of the customer base (segment_brand_affinity
    says WHAT they buy; this says how much per basket).

    Plan: orders⋈customer shuffle on custkey (both fact-sized at
    100 TB; only 2 columns of each survive the scan), one
    |segments|-row aggregate. Conditional o_custkey spread (guide
    §2.5): feeds the custkey join partitioning and parallelizes the
    fixed-point map + percentile partial agg (order-invariant)."""
    orders = load_spread(spark, sf_dir, "orders", "o_custkey").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            # One percentile buffer for the two ×4 quartiles (r11,
            # the quantile_summary precedent): the array form
            # builds/sorts the cents*4 buffer once and interpolates
            # both ps from it — bit-identical to two scalar calls.
            F.expr(
                "percentile(cents * 4, array(CAST(0.25 AS DOUBLE), "
                "CAST(0.75 AS DOUBLE)))"
            ).alias("qq_x4"),
            F.expr(
                "CAST(percentile(cents * 2, CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("med_x2"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "min_cents",
            "max_cents",
            F.expr("CAST(qq_x4[0] AS BIGINT) DIV 4").alias("q1_cents"),
            F.expr("med_x2 DIV 2").alias("median_cents"),
            F.expr("CAST(qq_x4[1] AS BIGINT) DIV 4").alias("q3_cents"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_VALUE_QUARTILES_SQL = """
WITH j AS (
  SELECT c.c_mktsegment,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), q AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(MIN(cents) AS BIGINT) AS min_cents,
         CAST(MAX(cents) AS BIGINT) AS max_cents,
         CAST(quantile_cont(cents * 4, CAST(0.25 AS DOUBLE)) AS BIGINT)
           AS q1_x4,
         CAST(quantile_cont(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS med_x2,
         CAST(quantile_cont(cents * 4, CAST(0.75 AS DOUBLE)) AS BIGINT)
           AS q3_x4
  FROM j GROUP BY 1
)
SELECT c_mktsegment, n_orders, min_cents, max_cents,
       q1_x4 // 4 AS q1_cents,
       med_x2 // 2 AS median_cents,
       q3_x4 // 4 AS q3_cents
FROM q
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Round 9 (batch 3): migration, catalog curves, tax, basket width
# ---------------------------------------------------------------------------

#: Static band edges (cents) for the value-migration matrix — fixed
#: by contract, not data-derived, so the matrix is comparable across
#: corpus versions (a quantile band would re-draw itself every run).
MIGRATION_BAND_CENTS = 5_000_000


def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value migration: for every customer active in at
    least two calendar years, the average-order-value band of their
    FIRST year vs their LAST year — the upgrade/downgrade matrix
    behind retention economics (the diagonal is stable value; below
    it, shrinking baskets). Bands are static 50k-cent steps capped
    at 4 (0..4) so the matrix is version-comparable.

    Integer-exact: per-(customer, year) cents sums, avg by DIV,
    band by DIV + least. Plan: one (custkey, year) partial agg, one
    per-customer reduce, a ≤ 25-cell rollup."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_year = orders.groupBy("o_custkey", "yr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    band = (
        f"CAST(least((cents DIV n) DIV {MIGRATION_BAND_CENTS}, 4) "
        "AS BIGINT)"
    )
    banded = per_year.select(
        "o_custkey", "yr", F.expr(band).alias("band")
    )
    per_cust = banded.groupBy("o_custkey").agg(
        F.min("yr").alias("y0"),
        F.max("yr").alias("y1"),
        F.min_by("band", "yr").alias("band_first"),
        F.max_by("band", "yr").alias("band_last"),
    ).where("y1 > y0")
    return (
        per_cust.groupBy("band_first", "band_last")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .withColumn(
            "share_bp",
            F.expr(
                "CAST((n_customers * 10000) DIV (SUM(n_customers) "
                "OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("band_first", "band_last")
    )


CUSTOMER_VALUE_MIGRATION_SQL = f"""
WITH o AS (
  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), per_year AS (
  SELECT o_custkey, yr, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM o GROUP BY 1, 2
), banded AS (
  SELECT o_custkey, yr,
         CAST(least((cents // n) // {MIGRATION_BAND_CENTS}, 4) AS BIGINT)
           AS band
  FROM per_year
), per_cust AS (
  SELECT o_custkey, MIN(yr) AS y0, MAX(yr) AS y1,
         min_by(band, yr) AS band_first,
         max_by(band, yr) AS band_last
  FROM banded GROUP BY 1
), cells AS (
  SELECT band_first, band_last, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM per_cust WHERE y1 > y0 GROUP BY 1, 2
)
SELECT band_first, band_last, n_customers,
       (n_customers * 10000) // CAST(SUM(n_customers) OVER () AS BIGINT)
         AS share_bp
FROM cells
ORDER BY band_first, band_last
"""


def part_size_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog size-price curve: per p_size, part count and the
    retail-price quartile ladder — does price scale with size, and
    where does the spread blow up? part_brand_price_dispersion cuts
    by brand (who); this cuts by the physical attribute (what).

    Determinism: ×4/×2 fixed-point quartiles on cents. Plan: part
    only — one |sizes|-row aggregate."""
    part = load_table(spark, sf_dir, "part").select(
        "p_size",
        F.expr(
            "CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        part.groupBy("p_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            # One percentile buffer for the two ×4 quartiles (r11,
            # the quantile_summary precedent — bit-identical).
            F.expr(
                "percentile(cents * 4, array(CAST(0.25 AS DOUBLE), "
                "CAST(0.75 AS DOUBLE)))"
            ).alias("qq_x4"),
            F.expr(
                "CAST(percentile(cents * 2, CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("med_x2"),
        )
        .select(
            "p_size",
            "n_parts",
            F.expr("CAST(qq_x4[0] AS BIGINT) DIV 4").alias("q1_cents"),
            F.expr("med_x2 DIV 2").alias("median_cents"),
            F.expr("CAST(qq_x4[1] AS BIGINT) DIV 4").alias("q3_cents"),
            F.expr(
                "(CAST(qq_x4[1] AS BIGINT) - CAST(qq_x4[0] AS BIGINT)) DIV 4"
            ).alias("iqr_cents"),
        )
        .orderBy("p_size")
    )


PART_SIZE_PRICE_CURVE_SQL = """
WITH p AS (
  SELECT p_size,
         CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM part
), q AS (
  SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(quantile_cont(cents * 4, CAST(0.25 AS DOUBLE)) AS BIGINT)
           AS q1_x4,
         CAST(quantile_cont(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS med_x2,
         CAST(quantile_cont(cents * 4, CAST(0.75 AS DOUBLE)) AS BIGINT)
           AS q3_x4
  FROM p GROUP BY 1
)
SELECT p_size, n_parts,
       q1_x4 // 4 AS q1_cents,
       med_x2 // 2 AS median_cents,
       q3_x4 // 4 AS q3_cents,
       (q3_x4 - q1_x4) // 4 AS iqr_cents
FROM q
ORDER BY p_size
"""


def tax_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tax-burden report: per whole-percent tax band, line count,
    discounted revenue, the tax collected on it, and the effective
    tax rate (bp) — the column the pricing pack never touched
    (l_tax). TPC-H charges tax AFTER discount; the per-row
    fixed-point keeps both engines on one lattice.

    One partial agg over lineitem to ~9 bands."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(floor(l_tax * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("band_pct"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("rev_cents"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("tax_cents"),
    )
    return (
        li.groupBy("band_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
            F.sum("tax_cents").cast("long").alias("tax_cents"),
        )
        .withColumn(
            "effective_tax_bp",
            F.expr(
                "CAST((CAST(tax_cents AS DECIMAL(38,0)) * 10000) "
                "DIV revenue_cents AS BIGINT)"
            ),
        )
        .orderBy("band_pct")
    )


TAX_BAND_REVENUE_SQL = """
WITH li AS (
  SELECT CAST(floor(l_tax * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS band_pct,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS tax_cents
  FROM lineitem
)
SELECT band_pct, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(tax_cents) AS BIGINT) AS tax_cents,
       CAST((CAST(SUM(tax_cents) AS HUGEINT) * 10000) //
         CAST(SUM(rev_cents) AS BIGINT) AS BIGINT) AS effective_tax_bp
FROM li
GROUP BY band_pct
ORDER BY band_pct
"""


def order_width_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket width vs discounting: orders bucketed by line count
    (1..6, 7+), per bucket the order count, total lines, and the
    average line discount (bp) — do wide orders get systematically
    deeper discounts? order_width_histogram counts the shapes; this
    prices them.

    Integer-exact: whole-percent per-line discounts summed, one DIV
    per bucket (pct·100 = bp). Plan: per-order partial agg, ≤ 7
    buckets."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("pct"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("width"),
        F.sum("pct").cast("long").alias("pct_sum"),
    )
    bucket = "CASE WHEN width >= 7 THEN '7+' ELSE CAST(width AS STRING) END"
    return (
        per_order.groupBy(F.expr(bucket).alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("width").cast("long").alias("n_lines"),
            F.sum("pct_sum").cast("long").alias("pct_total"),
        )
        .withColumn(
            "avg_discount_bp",
            F.expr("(pct_total * 100) DIV n_lines"),
        )
        .select(
            "width_bucket", "n_orders", "n_lines", "avg_discount_bp"
        )
        .orderBy("width_bucket")
    )


ORDER_WIDTH_DISCOUNT_PROFILE_SQL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS pct
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS width,
         CAST(SUM(pct) AS BIGINT) AS pct_sum
  FROM li GROUP BY 1
), buckets AS (
  SELECT CASE WHEN width >= 7 THEN '7+' ELSE CAST(width AS VARCHAR) END
           AS width_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(width) AS BIGINT) AS n_lines,
         CAST(SUM(pct_sum) AS BIGINT) AS pct_total
  FROM per_order GROUP BY 1
)
SELECT width_bucket, n_orders, n_lines,
       (pct_total * 100) // n_lines AS avg_discount_bp
FROM buckets
ORDER BY width_bucket
"""


def orders_priority_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value distribution per order priority: count, min/max
    and the ×4/×2 quartile ladder — is URGENT actually bigger money,
    or just louder? segment_priority_lift asks who files urgent
    orders; this prices them.

    One |priorities|-row aggregate; the fixed-point percentile
    contract keeps quartiles integral cross-engine. Spread REVERTED
    (r11): the o_orderkey spread cannot absorb the 5-group agg
    exchange (different keys), so it only added one — matched
    interleaved A/B measured off=1.205/1.265 vs on=1.354/1.447 twice."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            # One percentile buffer for the two ×4 quartiles (r11,
            # the quantile_summary precedent — bit-identical).
            F.expr(
                "percentile(cents * 4, array(CAST(0.25 AS DOUBLE), "
                "CAST(0.75 AS DOUBLE)))"
            ).alias("qq_x4"),
            F.expr(
                "CAST(percentile(cents * 2, CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            ).alias("med_x2"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "min_cents",
            "max_cents",
            F.expr("CAST(qq_x4[0] AS BIGINT) DIV 4").alias("q1_cents"),
            F.expr("med_x2 DIV 2").alias("median_cents"),
            F.expr("CAST(qq_x4[1] AS BIGINT) DIV 4").alias("q3_cents"),
        )
        .orderBy("o_orderpriority")
    )


ORDERS_PRIORITY_VALUE_PROFILE_SQL = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
), q AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(MIN(cents) AS BIGINT) AS min_cents,
         CAST(MAX(cents) AS BIGINT) AS max_cents,
         CAST(quantile_cont(cents * 4, CAST(0.25 AS DOUBLE)) AS BIGINT)
           AS q1_x4,
         CAST(quantile_cont(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS med_x2,
         CAST(quantile_cont(cents * 4, CAST(0.75 AS DOUBLE)) AS BIGINT)
           AS q3_x4
  FROM o GROUP BY 1
)
SELECT o_orderpriority, n_orders, min_cents, max_cents,
       q1_x4 // 4 AS q1_cents,
       med_x2 // 2 AS median_cents,
       q3_x4 // 4 AS q3_cents
FROM q
ORDER BY o_orderpriority
"""


def nation_order_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority mix per CUSTOMER NATION: per (nation, priority) the
    order count and the nation's internal share (bp) — regional
    operations tempo (a nation skewed to URGENT is an expedite-fee
    conversation). orders_priority_mix_by_month cuts by time,
    segment_priority_lift by segment; geography completes the cube.

    Plan: orders⋈customer shuffle on custkey, nation dim broadcast,
    one ≤ |nations|·5 agg, shares over a keyed window."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        orders.join(cust, "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .withColumn(
            "share_bp",
            F.expr(
                "CAST((n_orders * 10000) DIV (SUM(n_orders) OVER "
                "(PARTITION BY n_name)) AS BIGINT)"
            ),
        )
        .orderBy("n_name", "o_orderpriority")
    )


NATION_ORDER_PRIORITY_MIX_SQL = """
WITH j AS (
  SELECT n.n_name, o.o_orderpriority
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), agg AS (
  SELECT n_name, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM j GROUP BY 1, 2
)
SELECT n_name, o_orderpriority, n_orders,
       (n_orders * 10000) //
         CAST(SUM(n_orders) OVER (PARTITION BY n_name) AS BIGINT)
         AS share_bp
FROM agg
ORDER BY n_name, o_orderpriority
"""


def order_line_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-composition skew: how much of each order's value sits
    in its single biggest line. Per dominance band (top line's share
    of order revenue, 0-9 = deciles, 10 = single-line orders at
    exactly 100%), the order count and average order width (×100).
    A corpus of one-line orders batches differently than balanced
    baskets — this is the picking/packing shape report behind
    order_width_histogram (reference surface: ad-hoc SQL over the
    lakehouse, app/main.py:479).

    Exactness: per-line discounted revenue in BIGINT cents before
    any SUM, share and width by integer DIV.

    Plan (100 TB): one l_orderkey-keyed partial agg (map-side
    combine; the only fact-proportional exchange), then a ≤11-row
    band agg — never a window over raw lines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("cents").alias("total_cents"),
        F.max("cents").alias("top_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_order.where(F.col("total_cents") > 0)
        .select(
            F.expr(
                "CAST(((top_cents * 10000) DIV total_cents) DIV 1000 "
                "AS BIGINT)"
            ).alias("dominance_band"),
            "n_lines",
        )
        .groupBy("dominance_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "CAST((SUM(n_lines) * 100) DIV COUNT(*) AS BIGINT)"
            ).alias("avg_width_x100"),
        )
        .orderBy("dominance_band")
    )


ORDER_LINE_DOMINANCE_SQL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, SUM(cents) AS total_cents, MAX(cents) AS top_cents,
         COUNT(*) AS n_lines
  FROM li GROUP BY 1
)
SELECT CAST(((top_cents * 10000) // total_cents) // 1000 AS BIGINT)
         AS dominance_band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST((SUM(n_lines) * 100) // COUNT(*) AS BIGINT) AS avg_width_x100
FROM per_order
WHERE total_cents > 0
GROUP BY 1
ORDER BY 1
"""


def customer_nation_mix_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-book composition: per (nation, market segment), the
    customer count, balance book in cents, and the segment's share
    of the nation's customers (bp) — the account-planning view of
    where each segment is over/under-weighted geographically.

    Plan (100 TB): one (nationkey, segment)-keyed partial agg to a
    ≤|nations|×|segments| grid, nation dim broadcast, share over a
    |nation|-partitioned window on the tiny grid."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("bal_cents"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    agg = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("bal_cents").cast("long").alias("balance_cents"),
    )
    return (
        agg.join(F.broadcast(nation), "c_nationkey")
        .withColumn(
            "nation_share_bp",
            F.expr(
                "(n_customers * 10000) DIV "
                "(SUM(n_customers) OVER (PARTITION BY n_name))"
            ),
        )
        .select(
            "n_name", "c_mktsegment", "n_customers", "balance_cents",
            "nation_share_bp",
        )
        .orderBy("n_name", "c_mktsegment")
    )


CUSTOMER_NATION_MIX_SHARE_SQL = """
WITH agg AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS BIGINT) AS balance_cents
  FROM customer GROUP BY 1, 2
)
SELECT n_name, c_mktsegment, n_customers, balance_cents,
       (n_customers * 10000) //
         CAST(SUM(n_customers) OVER (PARTITION BY n_name) AS BIGINT)
         AS nation_share_bp
FROM agg JOIN nation ON n_nationkey = c_nationkey
ORDER BY n_name, c_mktsegment
"""


def monthly_revenue_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-year revenue dispersion without transcendentals: per
    order year, the number of active months, best and worst month
    (cents), and the peak-to-trough range as a share of the year's
    total (bp) — the seasonality-amplitude card seasonal_index
    normalizes away. A widening range year-over-year means capacity
    planning can't use flat staffing.

    Plan (100 TB): month partial agg (the only fact-proportional
    exchange) → ≤12-rows-per-year agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("year"),
        F.month("o_orderdate").alias("month"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    monthly = orders.groupBy("year", "month").agg(
        F.sum("cents").alias("m_cents")
    )
    return (
        monthly.groupBy("year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.min("m_cents").cast("long").alias("worst_month_cents"),
            F.max("m_cents").cast("long").alias("best_month_cents"),
            F.sum("m_cents").cast("long").alias("year_cents"),
        )
        .withColumn(
            "range_share_bp",
            F.expr(
                "((best_month_cents - worst_month_cents) * 10000) "
                "DIV year_cents"
            ),
        )
        .orderBy("year")
    )


MONTHLY_REVENUE_RANGE_SQL = """
WITH monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS year,
         EXTRACT(month FROM o_orderdate) AS month,
         SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS m_cents
  FROM orders GROUP BY 1, 2
), yearly AS (
  SELECT year, CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(MIN(m_cents) AS BIGINT) AS worst_month_cents,
         CAST(MAX(m_cents) AS BIGINT) AS best_month_cents,
         CAST(SUM(m_cents) AS BIGINT) AS year_cents
  FROM monthly GROUP BY 1
)
SELECT year, n_months, worst_month_cents, best_month_cents, year_cents,
       ((best_month_cents - worst_month_cents) * 10000) // year_cents
         AS range_share_bp
FROM yearly
ORDER BY year
"""


def region_segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue mix by region × market segment: order count, revenue
    cents, and the segment's share of its region's revenue (bp) —
    the territory-planning cut one level above
    customer_nation_mix_share's customer counts.

    Plan (100 TB): orders⋈customer is the one fact-scale shuffle
    (both sides keyed on custkey); nation and region dims broadcast;
    the share window runs on the ≤|regions|×|segments| grid."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey",
        "c_mktsegment",
    )
    geo = (
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nationkey"), "r_name")
    )
    agg = (
        orders.join(cust, "o_custkey")
        .join(F.broadcast(geo), "c_nationkey")
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    return (
        agg.withColumn(
            "region_share_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000) DIV "
                "(SUM(revenue_cents) OVER (PARTITION BY r_name)) AS BIGINT)"
            ),
        )
        .orderBy("r_name", "c_mktsegment")
    )


REGION_SEGMENT_SHARE_SQL = """
WITH agg AS (
  SELECT r_name, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2
)
SELECT r_name, c_mktsegment, n_orders, revenue_cents,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000) //
         SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS region_share_bp
FROM agg
ORDER BY r_name, c_mktsegment
"""


def order_gap_bands_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-cycle distribution: the gap in days between a
    customer's consecutive orders, banded (0-7 / 8-30 / 31-90 /
    91-365 / 365+), split by market segment — customer_order_cadence
    reports the mean; the BANDS say whether the mean hides a bimodal
    mix of subscribers and one-off buyers.

    Determinism: gaps ordered by (o_orderdate, o_orderkey) so ties
    on the date are broken by the unique key identically in both
    engines; day arithmetic on DATE casts.

    Plan (100 TB): the lag window is partitioned per customer (the
    natural key, never global), one orders⋈customer shuffle, then a
    ≤|segments|×5 band agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr("CAST(o_orderdate AS DATE)").alias("od"),
    )
    gaps = orders.select(
        "o_custkey",
        F.expr(
            "datediff(od, lag(od) OVER (PARTITION BY o_custkey "
            "ORDER BY od, o_orderkey))"
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    banded = gaps.join(cust, "o_custkey").select(
        "c_mktsegment",
        F.expr(
            "CASE WHEN gap_days <= 7 THEN '0-7' "
            "WHEN gap_days <= 30 THEN '08-30' "
            "WHEN gap_days <= 90 THEN '31-90' "
            "WHEN gap_days <= 365 THEN '91-365' "
            "ELSE '365+' END"
        ).alias("gap_band"),
        "gap_days",
    )
    return (
        banded.groupBy("c_mktsegment", "gap_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.expr(
                "CAST((SUM(gap_days) * 100) DIV COUNT(*) AS BIGINT)"
            ).alias("avg_gap_days_x100"),
        )
        .orderBy("c_mktsegment", "gap_band")
    )


ORDER_GAP_BANDS_BY_SEGMENT_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
), banded AS (
  SELECT c_mktsegment,
         CASE WHEN gap_days <= 7 THEN '0-7'
              WHEN gap_days <= 30 THEN '08-30'
              WHEN gap_days <= 90 THEN '31-90'
              WHEN gap_days <= 365 THEN '91-365'
              ELSE '365+' END AS gap_band,
         gap_days
  FROM gaps JOIN customer ON c_custkey = o_custkey
  WHERE gap_days IS NOT NULL
)
SELECT c_mktsegment, gap_band,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST((SUM(gap_days) * 100) // COUNT(*) AS BIGINT)
         AS avg_gap_days_x100
FROM banded
GROUP BY 1, 2
ORDER BY 1, 2
"""


def top_customer_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-account concentration: per nation, the active customer
    count, total order revenue (cents), the single biggest
    customer's revenue, and that top account's share (bp) — the
    "how exposed is this territory to one logo" risk card.
    revenue_concentration counts heads to reach 50/80/95%; this
    names the sharper single-account statistic per geography.

    Plan (100 TB): custkey partial agg (fact-proportional), one
    orders⋈customer shuffle, nation dim broadcast, ≤|nations| final
    agg — max and sum compose in the same pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("cents").alias("cust_cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        per_cust.join(cust, "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_customers"),
            F.sum("cust_cents").cast("long").alias("revenue_cents"),
            F.max("cust_cents").cast("long").alias("top_customer_cents"),
        )
        .withColumn(
            "top1_share_bp",
            F.expr("(top_customer_cents * 10000) DIV revenue_cents"),
        )
        .orderBy("n_name")
    )


TOP_CUSTOMER_SHARE_BY_NATION_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS cust_cents
  FROM orders GROUP BY 1
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS active_customers,
       CAST(SUM(cust_cents) AS BIGINT) AS revenue_cents,
       CAST(MAX(cust_cents) AS BIGINT) AS top_customer_cents,
       (CAST(MAX(cust_cents) AS BIGINT) * 10000) //
         CAST(SUM(cust_cents) AS BIGINT) AS top1_share_bp
FROM per_cust
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY 1
ORDER BY 1
"""


def orders_quarter_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue growth (bp): per calendar
    quarter, order count, revenue cents, and QoQ growth as the floor
    of the double ratio (the weekly_active_users signed-growth
    contract — floor matches across engines on negative growth where
    truncating DIV would not). revenue_yoy answers the annual
    question; the quarterly series is what a board deck actually
    plots.

    Plan (100 TB): one quarter partial agg (fact-proportional), lag
    window over the ≤|quarters| series."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "year(o_orderdate) * 10 + quarter(o_orderdate)"
        ).alias("yq"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    quarterly = (
        orders.groupBy("yq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .withColumn(
            "prev_cents",
            F.expr("lag(revenue_cents) OVER (ORDER BY yq)"),
        )
    )
    return quarterly.select(
        "yq",
        "n_orders",
        "revenue_cents",
        F.expr(
            "CASE WHEN prev_cents IS NULL THEN NULL ELSE "
            "CAST(floor((revenue_cents - prev_cents) * "
            "CAST(10000 AS DOUBLE) / prev_cents) AS BIGINT) END"
        ).alias("qoq_bp"),
    ).orderBy("yq")


ORDERS_QUARTER_GROWTH_SQL = """
WITH quarterly AS (
  SELECT EXTRACT(year FROM o_orderdate) * 10
           + EXTRACT(quarter FROM o_orderdate) AS yq,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1
), lagged AS (
  SELECT yq, n_orders, revenue_cents,
         lag(revenue_cents) OVER (ORDER BY yq) AS prev_cents
  FROM quarterly
)
SELECT yq, n_orders, revenue_cents,
       CASE WHEN prev_cents IS NULL THEN NULL ELSE
         CAST(floor((revenue_cents - prev_cents)
           * CAST(10000 AS DOUBLE) / prev_cents) AS BIGINT) END AS qoq_bp
FROM lagged
ORDER BY yq
"""


def supplier_balance_quartiles_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supply-side credit health by geography: per nation, exact
    quartiles of supplier account balances (cents) and the IQR —
    the supplier-book twin of events_type_value_quartiles' per-type
    card, using the same ×4/×2 fixed-point interpolated-percentile
    contract so every quartile is integral in both engines.

    Plan (100 TB): map-only cents projection → ONE ≤|nations|-row
    percentile aggregate, nation dim broadcast after the agg."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        F.expr(
            "CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    agg = sup.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        # One percentile buffer for the two ×4 quartiles (r11, the
        # quantile_summary precedent — bit-identical).
        F.expr(
            "percentile(cents * 4, array(CAST(0.25 AS DOUBLE), "
            "CAST(0.75 AS DOUBLE)))"
        ).alias("qq_x4"),
        F.expr(
            "CAST(percentile(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("med_x2"),
    )
    return (
        agg.join(F.broadcast(nation), "s_nationkey")
        .select(
            "n_name",
            "n_suppliers",
            F.expr("CAST(qq_x4[0] AS BIGINT) DIV 4").alias("q1_cents"),
            F.expr("med_x2 DIV 2").alias("median_cents"),
            F.expr("CAST(qq_x4[1] AS BIGINT) DIV 4").alias("q3_cents"),
            F.expr(
                "(CAST(qq_x4[1] AS BIGINT) - CAST(qq_x4[0] AS BIGINT)) DIV 4"
            ).alias("iqr_cents"),
        )
        .orderBy("n_name")
    )


SUPPLIER_BALANCE_QUARTILES_BY_NATION_SQL = """
WITH cents AS (
  SELECT s_nationkey,
         CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM supplier
), q AS (
  SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(quantile_cont(cents * 4, CAST(0.25 AS DOUBLE)) AS BIGINT)
           AS q1_x4,
         CAST(quantile_cont(cents * 2, CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS med_x2,
         CAST(quantile_cont(cents * 4, CAST(0.75 AS DOUBLE)) AS BIGINT)
           AS q3_x4
  FROM cents GROUP BY 1
)
SELECT n_name, n_suppliers,
       q1_x4 // 4 AS q1_cents,
       med_x2 // 2 AS median_cents,
       q3_x4 // 4 AS q3_cents,
       (q3_x4 - q1_x4) // 4 AS iqr_cents
FROM q JOIN nation ON n_nationkey = s_nationkey
ORDER BY n_name
"""


def linestatus_mix_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment pipeline mix over time: per ship month, the line
    count and revenue split across (l_returnflag, l_linestatus)
    cells with each cell's share of the month (bp) — TPC-H Q1's
    pricing summary unrolled into a time series, so a drift in the
    open/filled mix (capacity trouble) or the returns mix (quality
    trouble) shows WHEN it started, not just that it exists.

    Plan (100 TB): one (month, flag, status) partial agg — the grid
    is ≤ |months|×6 cells; the share window runs on the grid."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format(
            F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM"
        ).alias("month"),
        "l_returnflag",
        "l_linestatus",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 "
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    grid = li.groupBy("month", "l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    return (
        grid.withColumn(
            "month_share_bp",
            F.expr(
                "(n_lines * 10000) DIV "
                "(SUM(n_lines) OVER (PARTITION BY month))"
            ),
        )
        .orderBy("month", "l_returnflag", "l_linestatus")
    )


LINESTATUS_MIX_MONTHLY_SQL = """
WITH grid AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         l_returnflag, l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT month, l_returnflag, l_linestatus, n_lines, revenue_cents,
       (n_lines * 10000) //
         CAST(SUM(n_lines) OVER (PARTITION BY month) AS BIGINT)
         AS month_share_bp
FROM grid
ORDER BY month, l_returnflag, l_linestatus
"""


def brand_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand loyalty: per part brand, the distinct buyers, how many
    bought the brand in MORE than one order, the repeat rate (bp),
    and orders-per-buyer (×100) — part_name_price_lift prices the
    label; this measures whether the label retains. A premium brand
    with a commodity repeat rate is mispriced.

    Plan (100 TB): lineitem⋈part on partkey and the order join on
    orderkey are the two fact-scale shuffles; buyers collapse to the
    distinct (brand, custkey, orderkey) lattice map-side before any
    counting; final agg is ≤|brands| rows."""
    # conditional l_orderkey spread (guide §2.5): orderkey is one of
    # the distinct-lattice keys, so the spread partitioning absorbs
    # the distinct's exchange and the joins' map work runs 32-way
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    lattice = (
        li.join(part, "l_partkey")
        .join(orders, "l_orderkey")
        .select("p_brand", "o_custkey", "l_orderkey")
        .distinct()
    )
    per_buyer = lattice.groupBy("p_brand", "o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_buyer.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("buyers"),
            F.sum(
                F.when(F.col("n_orders") > 1, 1).otherwise(0)
            ).cast("long").alias("repeat_buyers"),
            F.sum("n_orders").cast("long").alias("brand_orders"),
        )
        .withColumn(
            "repeat_rate_bp",
            F.expr("(repeat_buyers * 10000) DIV buyers"),
        )
        .withColumn(
            "orders_per_buyer_x100",
            F.expr("(brand_orders * 100) DIV buyers"),
        )
        .orderBy("p_brand")
    )


BRAND_REPEAT_BUYERS_SQL = """
WITH lattice AS (
  SELECT DISTINCT p_brand, o_custkey, l_orderkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
), per_buyer AS (
  SELECT p_brand, o_custkey, COUNT(*) AS n_orders
  FROM lattice GROUP BY 1, 2
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS buyers,
       CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS repeat_buyers,
       CAST(SUM(n_orders) AS BIGINT) AS brand_orders,
       (CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT)
         * 10000) // CAST(COUNT(*) AS BIGINT) AS repeat_rate_bp,
       (CAST(SUM(n_orders) AS BIGINT) * 100) // CAST(COUNT(*) AS BIGINT)
         AS orders_per_buyer_x100
FROM per_buyer
GROUP BY 1
ORDER BY 1
"""


def customer_value_trend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer trajectory: each repeat customer's order history is
    split at its midpoint (rank by order date, ties by orderkey;
    first ceil(n/2) orders vs the rest) and the average order value
    of the two halves compared — growing (second half ≥ 110% of
    first), declining (≤ 90%), else flat — rolled up per market
    segment. The churn-model feature customer_order_cadence times;
    this one directions.

    Integer-exact: half sums in cents, the 110%/90% tests as
    cross-multiplied integer inequalities (no division at all).

    Plan (100 TB): one custkey-partitioned rank window (the natural
    key), one custkey agg, one broadcast-joined segment agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(o_orderdate AS DATE)").alias("od"),
    )
    ranked = orders.select(
        "o_custkey", "cents",
        F.expr(
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY od, o_orderkey)"
        ).alias("rk"),
        F.expr("COUNT(*) OVER (PARTITION BY o_custkey)").alias("n"),
    ).where(F.col("n") >= 2)
    halves = ranked.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.expr("rk <= (n + 1) DIV 2"), F.col("cents")).otherwise(0)
        ).alias("h1_cents"),
        F.sum(
            F.when(F.expr("rk > (n + 1) DIV 2"), F.col("cents")).otherwise(0)
        ).alias("h2_cents"),
        F.max(F.expr("(n + 1) DIV 2")).alias("n1"),
        F.max(F.expr("n - (n + 1) DIV 2")).alias("n2"),
    )
    classed = halves.select(
        "o_custkey",
        F.expr(
            "CASE WHEN h2_cents * n1 * 10 >= h1_cents * n2 * 11 "
            "THEN 'growing' "
            "WHEN h2_cents * n1 * 10 <= h1_cents * n2 * 9 "
            "THEN 'declining' ELSE 'flat' END"
        ).alias("trend"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        classed.join(cust, "o_custkey")
        .groupBy("c_mktsegment", "trend")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .withColumn(
            "segment_share_bp",
            F.expr(
                "(n_customers * 10000) DIV "
                "(SUM(n_customers) OVER (PARTITION BY c_mktsegment))"
            ),
        )
        .orderBy("c_mktsegment", "trend")
    )


CUSTOMER_VALUE_TREND_BANDS_SQL = """
WITH ranked AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
), halves AS (
  SELECT o_custkey,
         SUM(CASE WHEN rk <= (n + 1) // 2 THEN cents ELSE 0 END)
           AS h1_cents,
         SUM(CASE WHEN rk > (n + 1) // 2 THEN cents ELSE 0 END)
           AS h2_cents,
         MAX((n + 1) // 2) AS n1,
         MAX(n - (n + 1) // 2) AS n2
  FROM ranked WHERE n >= 2 GROUP BY 1
), classed AS (
  SELECT o_custkey,
         CASE WHEN h2_cents * n1 * 10 >= h1_cents * n2 * 11
              THEN 'growing'
              WHEN h2_cents * n1 * 10 <= h1_cents * n2 * 9
              THEN 'declining' ELSE 'flat' END AS trend
  FROM halves
)
SELECT c_mktsegment, trend,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       (CAST(COUNT(*) AS BIGINT) * 10000) //
         CAST(SUM(COUNT(*)) OVER (PARTITION BY c_mktsegment) AS BIGINT)
         AS segment_share_bp
FROM classed JOIN customer ON c_custkey = o_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def customer_spend_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve of customer spend: customers tiled into
    spend deciles via the two-phase boundary tiling
    (operators/tiling.py — exact NTILE, no SinglePartition window on
    the SF-growing customer spend table), each decile's revenue and
    its cumulative share (bp). revenue_concentration reports the
    50/80/95 crossing points; the full curve is what pricing and
    account-coverage models consume.

    Plan (100 TB): one custkey partial agg; tiling assigns buckets
    by broadcast boundary comparison; decile agg is 10 rows and the
    cumulative window runs on those 10."""
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("cents").alias("cust_cents")
    )
    tiled = with_global_ntile(
        per_cust, "cust_cents", "o_custkey", 10, "decile",
        cache_ns="customer_spend_lorenz",
    )
    agg = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cust_cents").cast("long").alias("revenue_cents"),
    )
    return (
        agg.withColumn(
            "cum_share_bp",
            F.expr(
                "CAST((SUM(revenue_cents) OVER (ORDER BY decile "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "* 10000) DIV (SUM(revenue_cents) OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("decile")
    )


CUSTOMER_SPEND_LORENZ_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT)) AS cust_cents
  FROM orders GROUP BY 1
), tiled AS (
  SELECT cust_cents,
         CAST(ntile(10) OVER (ORDER BY cust_cents, o_custkey)
           AS INTEGER) AS decile
  FROM per_cust
), agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cust_cents) AS BIGINT) AS revenue_cents
  FROM tiled GROUP BY 1
)
SELECT decile, n_customers, revenue_cents,
       CAST((SUM(revenue_cents) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) //
         CAST(SUM(revenue_cents) OVER () AS BIGINT) AS BIGINT)
         AS cum_share_bp
FROM agg
ORDER BY decile
"""


def nation_customer_supplier_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Demand/supply capacity per nation: customer count, supplier
    count, the customers-per-supplier ratio (×100), and each side's
    share of its global total (bp) — the territory card behind
    nation_trade_balance's flows: a nation long on demand and short
    on local supply imports fulfilment (and latency) from elsewhere.

    Plan (100 TB): two dim-table partial aggs to ≤|nations| rows
    each, one broadcast join between them, nation dim broadcast."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    return (
        cust.join(sup, "nk")
        .join(F.broadcast(nation), "nk")
        .select(
            "n_name",
            "n_customers",
            "n_suppliers",
            F.expr(
                "(n_customers * 100) DIV n_suppliers"
            ).alias("cust_per_supp_x100"),
            F.expr(
                "(n_customers * 10000) DIV "
                "(SUM(n_customers) OVER ())"
            ).alias("customer_share_bp"),
            F.expr(
                "(n_suppliers * 10000) DIV "
                "(SUM(n_suppliers) OVER ())"
            ).alias("supplier_share_bp"),
        )
        .orderBy("n_name")
    )


NATION_CUSTOMER_SUPPLIER_RATIO_SQL = """
WITH cust AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY 1
), sup AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY 1
)
SELECT n_name, n_customers, n_suppliers,
       (n_customers * 100) // n_suppliers AS cust_per_supp_x100,
       (n_customers * 10000) //
         CAST(SUM(n_customers) OVER () AS BIGINT) AS customer_share_bp,
       (n_suppliers * 10000) //
         CAST(SUM(n_suppliers) OVER () AS BIGINT) AS supplier_share_bp
FROM cust
JOIN sup USING (nk)
JOIN nation ON n_nationkey = nk
ORDER BY n_name
"""


def tax_discount_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-lever interaction: lineitems cross-tabbed by
    whole-percent tax band × discount band (0 / 1-2 / 3-5 / 6+ pct),
    with line counts, gross revenue cents, and the cell's effective
    take rate (net-of-discount, with-tax revenue vs gross, bp) —
    tax_band_revenue and discount_band_lift each show one lever;
    pricing committees set them together, and the interaction cell
    is what the ledger actually collects.

    Exactness: per-row BIGINT cents for gross and take before any
    SUM; whole-percent bands on round(tax·100)/round(discount·100).

    Plan (100 TB): one (tax_band, discount_band) partial agg to a
    ≤|tax bands|×4 grid."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(floor(l_tax * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("tax_pct"),
        F.expr(
            "CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("disc_pct"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("gross_cents"),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
            " * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("take_cents"),
    )
    banded = li.select(
        F.expr(
            "CASE WHEN disc_pct = 0 THEN '0' "
            "WHEN disc_pct <= 2 THEN '1-2' "
            "WHEN disc_pct <= 5 THEN '3-5' "
            "ELSE '6+' END"
        ).alias("discount_band"),
        "tax_pct",
        "gross_cents",
        "take_cents",
    )
    return (
        banded.groupBy("tax_pct", "discount_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("gross_cents").cast("long").alias("gross_cents"),
            F.sum("take_cents").cast("long").alias("take_cents"),
        )
        .withColumn(
            "take_rate_bp",
            F.expr(
                "CAST((CAST(take_cents AS DECIMAL(38,0)) * 10000) "
                "DIV gross_cents AS BIGINT)"
            ),
        )
        .orderBy("tax_pct", "discount_band")
    )


TAX_DISCOUNT_GRID_SQL = """
WITH li AS (
  SELECT CAST(floor(l_tax * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS tax_pct,
         CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS disc_pct,
         CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
           AS BIGINT) AS gross_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
           * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS take_cents
  FROM lineitem
), banded AS (
  SELECT CASE WHEN disc_pct = 0 THEN '0'
              WHEN disc_pct <= 2 THEN '1-2'
              WHEN disc_pct <= 5 THEN '3-5'
              ELSE '6+' END AS discount_band,
         tax_pct, gross_cents, take_cents
  FROM li
)
SELECT tax_pct, discount_band,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(gross_cents) AS BIGINT) AS gross_cents,
       CAST(SUM(take_cents) AS BIGINT) AS take_cents,
       CAST((CAST(SUM(take_cents) AS HUGEINT) * 10000) //
         CAST(SUM(gross_cents) AS BIGINT) AS BIGINT) AS take_rate_bp
FROM banded
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# price_index_series (r10)
# ---------------------------------------------------------------------------


def price_index_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres-style monthly price index over lineitem: the base
    period is the corpus's FIRST month; per part, the period price is
    the MIN unit price observed that month (deterministic integer —
    cents DIV quantity; an average would be a cross-engine rational),
    base quantities are the base month's per-part totals. Index(t) =
    Σ p_t·q₀ · 10000 DIV Σ p₀·q₀ over parts traded in BOTH months —
    the standard fixed-basket inflation read, integer-exact end to
    end (the house BIGINT-lattice rule).

    Plan (100 TB): one (month, part) aggregate off the fact scan
    (map-side partial); the base month joins back PART-keyed (never
    a cross join); final agg is ≤ months rows. The base-month
    subquery is a scalar broadcast."""
    # NOT spread: the per lattice is referenced 3× (base_m, base,
    # main), and each reference re-pays the spread exchange
    # (measured 1.10-1.15× slower with it)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 12 + "
            "month(CAST(l_shipdate AS DATE)) - 1"
        ).alias("m"),
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    # localCheckpoint (r11, guide §3.3): those same 3 references each
    # re-ran the fact scan + (month, part) aggregation; the
    # |months·parts|-bounded lattice now materializes once.
    per = li.groupBy("m", "pk").agg(
        F.min(F.expr("cents DIV qty")).alias("p"),
        F.sum("qty").alias("q"),
    ).localCheckpoint()
    base_m = per.agg(F.min("m").alias("m0"))
    base = (
        per.join(F.broadcast(base_m), per["m"] == F.col("m0"))
        .select("pk", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    return (
        per.join(base, "pk")
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("basket_parts"),
            F.sum(F.expr("p * q0")).cast("long").alias("cur_cents"),
            F.sum(F.expr("p0 * q0")).cast("long").alias("base_cents"),
        )
        .withColumn(
            # the monthly Σ p·q₀ numerator ×10⁴ can brush BIGINT at
            # the 100 TB target — DECIMAL(38,0) numerator, truncating
            # DIV (the lift-op rule; oracle uses HUGEINT //)
            "index_bp",
            F.expr(
                "CAST((CAST(cur_cents AS DECIMAL(38,0)) * 10000) "
                "DIV base_cents AS BIGINT)"
            ),
        )
        .orderBy("m")
    )


PRICE_INDEX_SERIES_SQL = """
WITH li AS (
  SELECT year(CAST(l_shipdate AS DATE)) * 12
           + month(CAST(l_shipdate AS DATE)) - 1 AS m,
         l_partkey AS pk,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), per AS (
  SELECT m, pk, MIN(cents // qty) AS p, SUM(qty) AS q
  FROM li GROUP BY 1, 2
), base AS (
  SELECT pk, p AS p0, q AS q0 FROM per
  WHERE m = (SELECT MIN(m) FROM per)
)
SELECT per.m,
       CAST(COUNT(*) AS BIGINT) AS basket_parts,
       CAST(SUM(per.p * base.q0) AS BIGINT) AS cur_cents,
       CAST(SUM(base.p0 * base.q0) AS BIGINT) AS base_cents,
       CAST((CAST(SUM(per.p * base.q0) AS HUGEINT) * 10000)
            // SUM(base.p0 * base.q0) AS BIGINT) AS index_bp
FROM per JOIN base ON per.pk = base.pk
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# status_priority_matrix (r10)
# ---------------------------------------------------------------------------


def status_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order lifecycle × urgency joint matrix: per (status, priority)
    cell the order count, value (cents), and value share of the
    STATUS row (bp) — does urgent work clear the pipeline faster, or
    do high-priority orders pool in 'O'pen like everything else?
    The per-priority profiles (orders_priority_value_profile) and
    monthly mixes slice one dimension; the joint matrix is where a
    stuck-cohort stands out.

    Plan (100 TB): one (status, priority) aggregate off the orders
    scan — map-side partial, ≤ |statuses|·|priorities| cells; the
    share window runs on those cells only."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.expr(
                "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            )
        ).alias("cents"),
    )
    return (
        agg.withColumn(
            "status_share_bp",
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 10000) DIV "
                "SUM(cents) OVER (PARTITION BY o_orderstatus) AS BIGINT)"
            ),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


STATUS_PRIORITY_MATRIX_SQL = """
WITH agg AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority, n_orders, cents,
       CAST((CAST(cents AS HUGEINT) * 10000) // SUM(cents)
            OVER (PARTITION BY o_orderstatus) AS BIGINT)
         AS status_share_bp
FROM agg
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# quantity_band_returns (r10)
# ---------------------------------------------------------------------------


def quantity_band_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do BIG line items come back more often? Lines banded by
    quantity decade (1-10 … 41-50); per band the line count, return
    rate (l_returnflag = 'R', bp), and mean discount (×10⁴) — the
    returns-exposure read that says whether bulk orders are the
    problem population (and whether they were already discount-baited
    in). returns_rate_monthly trends time; discount_band_lift bands
    the discount; this bands the QUANTITY.

    Plan (100 TB): pure map-side banding into a ≤ 5-cell aggregate;
    one shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST((CAST(l_quantity AS BIGINT) - 1) DIV 10 AS INT)"
        ).alias("qty_band"),
        F.expr(
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"
        ).alias("returned"),
        F.expr(
            "CAST(floor(l_discount * 10000 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("disc_x10k"),
    )
    return (
        li.groupBy("qty_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("returned").cast("long").alias("n_returned"),
            F.sum("disc_x10k").cast("long").alias("disc_sum"),
        )
        .withColumn(
            "return_bp", F.expr("(n_returned * 10000) DIV n_lines")
        )
        .withColumn(
            "mean_disc_x10k", F.expr("disc_sum DIV n_lines")
        )
        .select(
            "qty_band", "n_lines", "return_bp", "mean_disc_x10k"
        )
        .orderBy("qty_band")
    )


QUANTITY_BAND_RETURNS_SQL = """
WITH li AS (
  SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // 10 AS INTEGER)
           AS qty_band,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS returned,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_x10k
  FROM lineitem
)
SELECT qty_band,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST((SUM(returned) * 10000) // COUNT(*) AS BIGINT) AS return_bp,
       CAST(SUM(disc_x10k) // COUNT(*) AS BIGINT) AS mean_disc_x10k
FROM li
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# brand_type_span (r10)
# ---------------------------------------------------------------------------


def brand_type_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog breadth per brand: distinct part types and sizes
    carried, part count, and the retail price range (cents) — the
    assortment-planning view (a brand spanning every type with a
    wide price range is a generalist; a narrow span is a niche
    line). part_brand_price_dispersion measures price VARIANCE;
    part_type_brand_matrix counts (type, brand) cells; this measures
    per-brand assortment SPAN.

    Plan (100 TB): one brand-keyed aggregate off the part dim scan;
    distinct counts are exact (brand cardinality is bounded);
    output ≤ |brands| rows."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.countDistinct("p_type").cast("long").alias("n_types"),
            F.countDistinct("p_size").cast("long").alias("n_sizes"),
            F.min(
                F.expr(
                    "CAST(floor(p_retailprice * 100 + "
                    "CAST(0.5 AS DOUBLE)) AS BIGINT)"
                )
            ).alias("min_price_cents"),
            F.max(
                F.expr(
                    "CAST(floor(p_retailprice * 100 + "
                    "CAST(0.5 AS DOUBLE)) AS BIGINT)"
                )
            ).alias("max_price_cents"),
        )
        .withColumn(
            "price_span_cents",
            F.expr("max_price_cents - min_price_cents"),
        )
        .orderBy("p_brand")
    )


BRAND_TYPE_SPAN_SQL = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
       CAST(MIN(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS min_price_cents,
       CAST(MAX(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS max_price_cents,
       CAST(MAX(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
            - MIN(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS price_span_cents
FROM part
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# segment_balance_profile (r10)
# ---------------------------------------------------------------------------


def segment_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit posture per market segment: customers, share with a
    negative account balance (bp), and the mean balance split by
    sign (cents) — the receivables-risk read segment_value_quartiles
    (spend quartiles) does not carry. A segment whose negative share
    climbs is extending credit faster than it collects.

    Plan (100 TB): one segment-keyed aggregate off the customer dim
    scan; output ≤ |segments| rows."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.expr(
            "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.expr("CASE WHEN cents < 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_negative"),
            F.sum(F.expr("CASE WHEN cents < 0 THEN cents ELSE 0 END"))
            .cast("long")
            .alias("neg_cents"),
            F.sum(F.expr("CASE WHEN cents >= 0 THEN cents ELSE 0 END"))
            .cast("long")
            .alias("pos_cents"),
        )
        .withColumn(
            "negative_bp", F.expr("(n_negative * 10000) DIV n_customers")
        )
        .withColumn(
            "mean_neg_cents",
            F.expr(
                "CASE WHEN n_negative > 0 THEN neg_cents DIV n_negative "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn(
            "mean_pos_cents",
            F.expr(
                "CASE WHEN n_customers > n_negative THEN pos_cents DIV "
                "(n_customers - n_negative) ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .select(
            "c_mktsegment", "n_customers", "negative_bp",
            "mean_neg_cents", "mean_pos_cents",
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_BALANCE_PROFILE_SQL = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
), agg AS (
  SELECT c_mktsegment,
         COUNT(*) AS n_customers,
         SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS n_negative,
         SUM(CASE WHEN cents < 0 THEN cents ELSE 0 END) AS neg_cents,
         SUM(CASE WHEN cents >= 0 THEN cents ELSE 0 END) AS pos_cents
  FROM c GROUP BY 1
)
SELECT c_mktsegment,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST((n_negative * 10000) // n_customers AS BIGINT)
         AS negative_bp,
       CAST(CASE WHEN n_negative > 0 THEN neg_cents // n_negative
                 ELSE 0 END AS BIGINT) AS mean_neg_cents,
       CAST(CASE WHEN n_customers > n_negative
                 THEN pos_cents // (n_customers - n_negative)
                 ELSE 0 END AS BIGINT) AS mean_pos_cents
FROM agg
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# monthly_new_vs_repeat_revenue (r10)
# ---------------------------------------------------------------------------


def monthly_new_vs_repeat_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue growth accounting: per month, revenue (cents) split
    into FIRST-ORDER customers vs repeat customers, with the new
    share (bp) — events_growth_accounting counts USERS on events;
    this weighs the ORDER BOOK: a business whose new-share collapses
    is living off its base. First-order month comes from a
    customer-keyed min (no window); integer month arithmetic and
    cent sums keep both engines bit-equal.

    Plan (100 TB): one custkey partial agg (first month), one
    custkey-keyed join back to orders, a ≤ months final agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(CAST(o_orderdate AS DATE)) * 12 + "
            "month(CAST(o_orderdate AS DATE)) - 1"
        ).alias("m"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    tagged = orders.join(first, "o_custkey").withColumn(
        "is_new", F.expr("CASE WHEN m = m0 THEN 1 ELSE 0 END")
    )
    return (
        tagged.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr("CASE WHEN is_new = 1 THEN cents ELSE 0 END"))
            .cast("long")
            .alias("new_cents"),
            F.sum(F.expr("CASE WHEN is_new = 0 THEN cents ELSE 0 END"))
            .cast("long")
            .alias("repeat_cents"),
        )
        .withColumn(
            "new_share_bp",
            F.expr(
                "CAST((CAST(new_cents AS DECIMAL(38,0)) * 10000) DIV "
                "(new_cents + repeat_cents) AS BIGINT)"
            ),
        )
        .orderBy("m")
    )


MONTHLY_NEW_VS_REPEAT_REVENUE_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS m,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1
)
SELECT o.m,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o.m = first.m0 THEN o.cents ELSE 0 END)
            AS BIGINT) AS new_cents,
       CAST(SUM(CASE WHEN o.m <> first.m0 THEN o.cents ELSE 0 END)
            AS BIGINT) AS repeat_cents,
       CAST((CAST(SUM(CASE WHEN o.m = first.m0 THEN o.cents
                           ELSE 0 END) AS HUGEINT) * 10000)
            // SUM(o.cents) AS BIGINT) AS new_share_bp
FROM o JOIN first USING (o_custkey)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# spend_consistency_bands (r10)
# ---------------------------------------------------------------------------


def spend_consistency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are a customer's orders steady or spiky? Per repeat customer
    (≥ 2 orders) the coefficient of variation of order values is
    computed on the exact integer lattice (Σ, Σ², n — cv²·10⁴ =
    (n·Σ² − Σ²ᵤₘ)·10⁴ DIV Σ²ᵤₘ, no square root needed for banding),
    then customers collapse into consistency bands with each band's
    lifetime value — steady spenders are subscription-shaped,
    spiky ones are promotion-shaped, and the band sizes say which
    regime the book is in.

    Plan (100 TB): one custkey partial agg carrying (n, Σ, Σ²) —
    Σ² of cents ≈ 10¹⁴ per order stays far inside BIGINT at any
    order count that fits a customer — then a ≤ bands re-agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.expr("(cents DIV 100) * (cents DIV 100)")).alias("s2d"),
    )
    # cv²×10⁴ on whole-dollar units (cents² over many orders could
    # brush BIGINT at extreme LTVs; dollars keep 4 more decades of
    # headroom with identical banding in both engines)
    banded = (
        per_cust.where("n >= 2")
        .withColumn("sd", F.expr("s DIV 100"))
        .withColumn(
            "cv2_x10k",
            F.expr("((n * s2d - sd * sd) * 10000) DIV (sd * sd)"),
        )
        .withColumn(
            "band",
            F.expr(
                "CASE WHEN cv2_x10k < 1000 THEN 'steady' "
                "WHEN cv2_x10k < 5000 THEN 'mixed' "
                "ELSE 'spiky' END"
            ),
        )
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("s").cast("long").alias("ltv_cents"),
        )
        .orderBy("band")
    )


SPEND_CONSISTENCY_BANDS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS s,
         SUM((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)
             * (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100))
           AS s2d
  FROM orders GROUP BY 1
), banded AS (
  SELECT n, s,
         CASE WHEN ((n * s2d - (s // 100) * (s // 100)) * 10000)
                   // ((s // 100) * (s // 100)) < 1000 THEN 'steady'
              WHEN ((n * s2d - (s // 100) * (s // 100)) * 10000)
                   // ((s // 100) * (s // 100)) < 5000 THEN 'mixed'
              ELSE 'spiky' END AS band
  FROM per_cust WHERE n >= 2
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(s) AS BIGINT) AS ltv_cents
FROM banded
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# brand_return_exposure (r10)
# ---------------------------------------------------------------------------


def brand_return_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand returns exposure: line count, returned-line count
    (l_returnflag = 'R'), return incidence (bp), revenue cents and
    the returned share of that revenue (bp). returns_rate_monthly
    trends returns over time and quantity_band_returns cuts by order
    size; this pins WHICH CATALOG BRANDS carry the exposure — a
    brand whose value-share of returns runs far above its line-share
    is a quality or description problem, not a volume one. Cents
    lattice keeps both engines bit-equal; shares are integer DIV.

    Plan (100 TB): part is a dim — broadcast join, no fact shuffle;
    one (brand) partial agg off the joined scan (≤ |brands| rows),
    share arithmetic on the aggregated cells only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").alias(
            "is_ret"
        ),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("is_ret").cast("long").alias("returned_lines"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.sum(F.expr("CASE WHEN is_ret = 1 THEN cents ELSE 0 END"))
            .cast("long")
            .alias("returned_cents"),
        )
        .withColumn(
            "return_rate_bp",
            F.expr(
                "CAST((returned_lines * 10000) DIV n_lines AS BIGINT)"
            ),
        )
        .withColumn(
            # a per-brand CENTS sum ×10⁴ can brush BIGINT at the
            # 100 TB target (≈10¹⁷ cents · 10⁴ > 2⁶³), so the
            # numerator runs in DECIMAL(38,0); Spark DIV on decimals
            # truncates like DuckDB HUGEINT // (the lift-op rule —
            # DuckDB DECIMAL // would round)
            "value_at_risk_bp",
            F.expr(
                "CAST((CAST(returned_cents AS DECIMAL(38,0)) * 10000)"
                " DIV revenue_cents AS BIGINT)"
            ),
        )
        .orderBy("p_brand")
    )


BRAND_RETURN_EXPOSURE_SQL = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS returned_lines,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(floor(l_extendedprice * 100 + 0.5)
                               AS BIGINT) ELSE 0 END)
            AS BIGINT) AS returned_cents,
       CAST((SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             * 10000) // COUNT(*) AS BIGINT) AS return_rate_bp,
       CAST((CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)
                           ELSE 0 END) AS HUGEINT) * 10000)
            // SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS value_at_risk_bp
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# price_index_paasche (r10)
# ---------------------------------------------------------------------------


def price_index_paasche(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paasche-style monthly price index — the current-basket twin
    of price_index_series (Laspeyres): same per-(month, part)
    deterministic MIN unit-price lattice and first-month base, but
    weights are the CURRENT month's quantities: index(t) =
    Σ pₜ·qₜ · 10000 DIV Σ p₀·qₜ over parts traded in both months.
    Laspeyres overstates inflation when buyers substitute away from
    items that got expensive; Paasche understates it — the spread
    between the two series (published side by side) bounds the true
    index without any non-integer arithmetic.

    Plan (100 TB): identical shape to the Laspeyres series — one
    (month, part) partial agg off the fact scan, the base month
    joins back PART-keyed, final agg is ≤ months rows."""
    # NOT spread: the per lattice is referenced 3× (base_m, base,
    # main), and each reference re-pays the spread exchange
    # (measured 1.10-1.15× slower with it)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 12 + "
            "month(CAST(l_shipdate AS DATE)) - 1"
        ).alias("m"),
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    # localCheckpoint (r11, guide §3.3): those same 3 references each
    # re-ran the fact scan + (month, part) aggregation; the
    # |months·parts|-bounded lattice now materializes once.
    per = li.groupBy("m", "pk").agg(
        F.min(F.expr("cents DIV qty")).alias("p"),
        F.sum("qty").alias("q"),
    ).localCheckpoint()
    base_m = per.agg(F.min("m").alias("m0"))
    base = (
        per.join(F.broadcast(base_m), per["m"] == F.col("m0"))
        .select("pk", F.col("p").alias("p0"))
    )
    return (
        per.join(base, "pk")
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("basket_parts"),
            F.sum(F.expr("p * q")).cast("long").alias("cur_cents"),
            F.sum(F.expr("p0 * q")).cast("long").alias("base_cents"),
        )
        .withColumn(
            # the monthly Σ p·q numerator ×10⁴ can brush BIGINT at
            # the 100 TB target — DECIMAL(38,0) numerator, truncating
            # DIV (the lift-op rule; oracle uses HUGEINT //)
            "index_bp",
            F.expr(
                "CAST((CAST(cur_cents AS DECIMAL(38,0)) * 10000) "
                "DIV base_cents AS BIGINT)"
            ),
        )
        .orderBy("m")
    )


PRICE_INDEX_PAASCHE_SQL = """
WITH li AS (
  SELECT year(CAST(l_shipdate AS DATE)) * 12
           + month(CAST(l_shipdate AS DATE)) - 1 AS m,
         l_partkey AS pk,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), per AS (
  SELECT m, pk, MIN(cents // qty) AS p, SUM(qty) AS q
  FROM li GROUP BY 1, 2
), base AS (
  SELECT pk, p AS p0 FROM per
  WHERE m = (SELECT MIN(m) FROM per)
)
SELECT per.m,
       CAST(COUNT(*) AS BIGINT) AS basket_parts,
       CAST(SUM(per.p * per.q) AS BIGINT) AS cur_cents,
       CAST(SUM(base.p0 * per.q) AS BIGINT) AS base_cents,
       CAST((CAST(SUM(per.p * per.q) AS HUGEINT) * 10000)
            // SUM(base.p0 * per.q) AS BIGINT) AS index_bp
FROM per JOIN base ON per.pk = base.pk
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# price_index_fisher (r11)
# ---------------------------------------------------------------------------


def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ideal monthly price index — the geometric mean of the
    Laspeyres (base-basket) and Paasche (current-basket) indices the
    r10 pair already publishes: Laspeyres overstates inflation under
    substitution, Paasche understates it, and Fisher is the
    superlative index in between (Diewert 1976). Both component
    indices are the exact integer-rational bp values of their
    standalone operators — one (month, part) lattice feeds both, the
    base month broadcasts back part-keyed — and fisher_bp =
    floor(sqrt(lasp_bp · paas_bp)). The product is < 2^53, IEEE-754
    requires sqrt correctly rounded, and both engines floor the same
    double, so the value is bit-deterministic cross-engine.

    Plan (100 TB): identical shape to price_index_series — one
    (month, part) partial agg off the fact scan, base month joined
    back part-keyed (AQE-broadcast), final agg ≤ months rows; the
    two weightings are extra columns on the SAME lattice, not a
    second scan."""
    # NOT spread: the per lattice is referenced 3× (base_m, base,
    # main), and each reference re-pays the spread exchange
    # (measured 1.10-1.15× slower with it)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 12 + "
            "month(CAST(l_shipdate AS DATE)) - 1"
        ).alias("m"),
        F.col("l_partkey").alias("pk"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    # localCheckpoint (r11, guide §3.3): those same 3 references each
    # re-ran the fact scan + (month, part) aggregation; the
    # |months·parts|-bounded lattice now materializes once.
    per = li.groupBy("m", "pk").agg(
        F.min(F.expr("cents DIV qty")).alias("p"),
        F.sum("qty").alias("q"),
    ).localCheckpoint()
    base_m = per.agg(F.min("m").alias("m0"))
    base = (
        per.join(F.broadcast(base_m), per["m"] == F.col("m0"))
        .select("pk", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    return (
        per.join(base, "pk")
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("basket_parts"),
            F.sum(F.expr("p * q0")).cast("long").alias("lasp_cur"),
            F.sum(F.expr("p0 * q0")).cast("long").alias("lasp_base"),
            F.sum(F.expr("p * q")).cast("long").alias("paas_cur"),
            F.sum(F.expr("p0 * q")).cast("long").alias("paas_base"),
        )
        .withColumn(
            "lasp_bp",
            F.expr(
                "CAST((CAST(lasp_cur AS DECIMAL(38,0)) * 10000) "
                "DIV lasp_base AS BIGINT)"
            ),
        )
        .withColumn(
            "paas_bp",
            F.expr(
                "CAST((CAST(paas_cur AS DECIMAL(38,0)) * 10000) "
                "DIV paas_base AS BIGINT)"
            ),
        )
        .withColumn(
            "fisher_bp",
            F.expr(
                "CAST(floor(sqrt(CAST(lasp_bp * paas_bp AS DOUBLE))) "
                "AS BIGINT)"
            ),
        )
        .select(
            "m", "basket_parts", "lasp_bp", "paas_bp", "fisher_bp"
        )
        .orderBy("m")
    )


PRICE_INDEX_FISHER_SQL = """
WITH li AS (
  SELECT year(CAST(l_shipdate AS DATE)) * 12
           + month(CAST(l_shipdate AS DATE)) - 1 AS m,
         l_partkey AS pk,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), per AS (
  SELECT m, pk, MIN(cents // qty) AS p, SUM(qty) AS q
  FROM li GROUP BY 1, 2
), base AS (
  SELECT pk, p AS p0, q AS q0 FROM per
  WHERE m = (SELECT MIN(m) FROM per)
), agg AS (
  SELECT per.m,
         CAST(COUNT(*) AS BIGINT) AS basket_parts,
         CAST((CAST(SUM(per.p * base.q0) AS HUGEINT) * 10000)
              // SUM(base.p0 * base.q0) AS BIGINT) AS lasp_bp,
         CAST((CAST(SUM(per.p * per.q) AS HUGEINT) * 10000)
              // SUM(base.p0 * per.q) AS BIGINT) AS paas_bp
  FROM per JOIN base ON per.pk = base.pk
  GROUP BY 1
)
SELECT m, basket_parts, lasp_bp, paas_bp,
       CAST(floor(sqrt(CAST(lasp_bp * paas_bp AS DOUBLE)))
            AS BIGINT) AS fisher_bp
FROM agg
ORDER BY m
"""


# ---------------------------------------------------------------------------
# ship_delay_by_priority (r11)
# ---------------------------------------------------------------------------


def ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA audit: line-level order→ship latency banded
    (≤7 / ≤30 / ≤90 / 90+ days) per order priority, with each band's
    line share of its priority row (bp) and the priority's mean
    delay in whole days. late_priority counts one lateness predicate;
    this maps the whole latency DISTRIBUTION against the priority
    ladder — a 1-URGENT row whose mass sits in 90+ is the ops
    finding. datediff on DATE-cast timestamps is whole-day integer
    on both engines.

    Plan (100 TB): orders⋈lineitem on the orderkey both tables
    cluster on (the co-keyed fact join every TPC-H engine makes);
    one (priority, band) partial agg bounds everything after the
    join at ≤ 5·4 cells; the share window runs on that grid."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sdate")
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.expr("datediff(sdate, odate)").alias("delay_d"),
    )
    banded = joined.select(
        "o_orderpriority",
        "delay_d",
        F.expr(
            "CASE WHEN delay_d <= 7 THEN 'a_week' "
            "WHEN delay_d <= 30 THEN 'b_month' "
            "WHEN delay_d <= 90 THEN 'c_quarter' "
            "ELSE 'd_longer' END"
        ).alias("band"),
    )
    grid = banded.groupBy("o_orderpriority", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("delay_d").cast("long").alias("delay_days_sum"),
    )
    return (
        grid.withColumn(
            "band_share_bp",
            F.expr(
                "(n_lines * 10000) DIV (SUM(n_lines) OVER "
                "(PARTITION BY o_orderpriority))"
            ),
        )
        .withColumn(
            "mean_delay_d",
            F.expr("CAST(delay_days_sum DIV n_lines AS BIGINT)"),
        )
        .select(
            "o_orderpriority", "band", "n_lines", "band_share_bp",
            "mean_delay_d",
        )
        .orderBy("o_orderpriority", "band")
    )


SHIP_DELAY_BY_PRIORITY_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS delay_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), banded AS (
  SELECT o_orderpriority, delay_d,
         CASE WHEN delay_d <= 7 THEN 'a_week'
              WHEN delay_d <= 30 THEN 'b_month'
              WHEN delay_d <= 90 THEN 'c_quarter'
              ELSE 'd_longer' END AS band
  FROM j
), grid AS (
  SELECT o_orderpriority, band,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(delay_d) AS BIGINT) AS delay_days_sum
  FROM banded GROUP BY 1, 2
)
SELECT o_orderpriority, band, n_lines,
       (n_lines * 10000)
         // CAST(SUM(n_lines) OVER (PARTITION BY o_orderpriority)
                 AS BIGINT) AS band_share_bp,
       CAST(delay_days_sum // n_lines AS BIGINT) AS mean_delay_d
FROM grid
ORDER BY o_orderpriority, band
"""


# ---------------------------------------------------------------------------
# order_value_band_monthly (r11)
# ---------------------------------------------------------------------------


def order_value_band_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value mix trend: orders banded by total price (<1k /
    <10k / <100k / 100k+) per month, with each band's share of the
    month's orders and of the month's revenue (bp). monthly_revenue_
    range tracks extremes and orders_priority_mix_by_month tracks
    the priority mix; this tracks WHERE THE MONEY SITS — a revenue
    share migrating into the top band while the order share doesn't
    is whale concentration in the making. Cents are fixed before any
    sum; shares are integer DIV.

    Plan (100 TB): map-only banding off the orders scan → one
    (month, band) partial agg; both share windows run per month on
    the ≤ months·4 grid."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "year(CAST(o_orderdate AS DATE)) * 12 + "
            "month(CAST(o_orderdate AS DATE)) - 1"
        ).alias("m"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    ).withColumn(
        "band",
        F.expr(
            "CASE WHEN cents < 100000 THEN 'a_lt1k' "
            "WHEN cents < 1000000 THEN 'b_lt10k' "
            "WHEN cents < 10000000 THEN 'c_lt100k' "
            "ELSE 'd_ge100k' END"
        ),
    )
    grid = o.groupBy("m", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    return (
        grid.withColumn(
            "order_share_bp",
            F.expr(
                "(n_orders * 10000) DIV (SUM(n_orders) OVER "
                "(PARTITION BY m))"
            ),
        )
        .withColumn(
            # monthly cents ×10⁴ brushes BIGINT at 100 TB — DECIMAL
            # numerator, truncating DIV (HUGEINT // in the oracle)
            "revenue_share_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000) "
                "DIV (SUM(revenue_cents) OVER (PARTITION BY m)) "
                "AS BIGINT)"
            ),
        )
        .orderBy("m", "band")
    )


ORDER_VALUE_BAND_MONTHLY_SQL = """
WITH o AS (
  SELECT year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS m,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), banded AS (
  SELECT m, cents,
         CASE WHEN cents < 100000 THEN 'a_lt1k'
              WHEN cents < 1000000 THEN 'b_lt10k'
              WHEN cents < 10000000 THEN 'c_lt100k'
              ELSE 'd_ge100k' END AS band
  FROM o
), grid AS (
  SELECT m, band, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM banded GROUP BY 1, 2
)
SELECT m, band, n_orders, revenue_cents,
       (n_orders * 10000)
         // CAST(SUM(n_orders) OVER (PARTITION BY m) AS BIGINT)
         AS order_share_bp,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000)
            // SUM(revenue_cents) OVER (PARTITION BY m) AS BIGINT)
         AS revenue_share_bp
FROM grid
ORDER BY m, band
"""


# ---------------------------------------------------------------------------
# size_demand_curve (r11)
# ---------------------------------------------------------------------------


def size_demand_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand by physical part size: per p_size, distinct parts
    traded, line count, total quantity, revenue cents, and the mean
    quantity per line ×100 — the merchandising curve that says
    whether demand concentrates in small or bulky SKUs (a revenue
    curve that rises with size while quantity falls is price mix,
    not volume). part_size_price_curve prices the catalog; this
    weighs what actually SOLD.

    Plan (100 TB): part is a dim — broadcast join, no fact shuffle;
    one ≤|sizes| partial agg off the joined scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size"
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_size")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("qty").cast("long").alias("total_qty"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .withColumn(
            "mean_qty_x100",
            F.expr("CAST((total_qty * 100) DIV n_lines AS BIGINT)"),
        )
        .orderBy("p_size")
    )


SIZE_DEMAND_CURVE_SQL = """
SELECT p_size,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST((SUM(CAST(l_quantity AS BIGINT)) * 100) // COUNT(*)
            AS BIGINT) AS mean_qty_x100
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_size
ORDER BY p_size
"""


# ---------------------------------------------------------------------------
# nation_negative_balance (r11)
# ---------------------------------------------------------------------------


def nation_negative_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-risk geography: per nation, customers in arrears
    (negative account balance), their share of the nation's book
    (bp), and the arrears depth in cents — where receivables risk
    concentrates. customer_nation_mix_share counts composition and
    segment_balance_profile bands the whole balance range; this
    isolates the NEGATIVE tail by geography. Balances fix to cents
    before any comparison or sum, so the zero boundary cannot move
    between engines.

    Plan (100 TB): nation is a dim — broadcast join; one ≤|nations|
    partial agg off the customer scan."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr(
            "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("bal_cents"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.expr("CASE WHEN bal_cents < 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_negative"),
            F.sum(
                F.expr("CASE WHEN bal_cents < 0 THEN -bal_cents ELSE 0 END")
            )
            .cast("long")
            .alias("arrears_cents"),
        )
        .withColumn(
            "negative_share_bp",
            F.expr("CAST((n_negative * 10000) DIV n_customers AS BIGINT)"),
        )
        .orderBy("n_name")
    )


NATION_NEGATIVE_BALANCE_SQL = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                          < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(SUM(CASE WHEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                          < 0
                     THEN -CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS arrears_cents,
       CAST((SUM(CASE WHEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                           < 0 THEN 1 ELSE 0 END) * 10000)
            // COUNT(*) AS BIGINT) AS negative_share_bp
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# returnflag_linestatus_grid (r11)
# ---------------------------------------------------------------------------


def returnflag_linestatus_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q1 grid read as a composition audit: per
    (returnflag, linestatus) cell, lines, quantity, revenue cents,
    and the cell's share of ALL lines and of ALL revenue (bp).
    agg_pricing_summary reproduces Q1's measure battery; this
    publishes the grid's RELATIVE mix — the two numbers a monitoring
    dashboard actually thresholds (the 'R' row share is the
    corpus-wide return rate).

    Plan (100 TB): one (flag, status) partial agg off the fact scan
    (≤ 6 cells); shares are windows over that bounded grid."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    grid = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    return (
        grid.withColumn(
            "line_share_bp",
            F.expr("(n_lines * 10000) DIV (SUM(n_lines) OVER ())"),
        )
        .withColumn(
            "revenue_share_bp",
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000) "
                "DIV (SUM(revenue_cents) OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


RETURNFLAG_LINESTATUS_GRID_SQL = """
WITH grid AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n_lines, total_qty, revenue_cents,
       (n_lines * 10000) // CAST(SUM(n_lines) OVER () AS BIGINT)
         AS line_share_bp,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000)
            // SUM(revenue_cents) OVER () AS BIGINT)
         AS revenue_share_bp
FROM grid
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# order_age_by_status (r11)
# ---------------------------------------------------------------------------


def order_age_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging by state: per order status, the order-age
    distribution against the corpus max date (min / mean / max whole
    days) plus count and value. orders_backlog_aging bands open
    orders; this contrasts the AGE PROFILE of the states themselves
    — an 'O' (open) mean age drifting toward 'F' (fulfilled) means
    fulfilment is stalling. The anchor broadcasts from a one-row
    aggregate, so the report is reproducible at any read.

    Plan (100 TB): one-row anchor broadcast back; one ≤|statuses|
    partial agg off the orders scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("odate"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    anchor = o.agg(F.max("odate").alias("anchor_date"))
    return (
        o.crossJoin(F.broadcast(anchor))
        .withColumn("age_d", F.expr("datediff(anchor_date, odate)"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.min("age_d").cast("long").alias("min_age_d"),
            F.max("age_d").cast("long").alias("max_age_d"),
            F.sum("age_d").cast("long").alias("age_sum"),
        )
        .withColumn(
            "mean_age_d",
            F.expr("CAST(age_sum DIV n_orders AS BIGINT)"),
        )
        .drop("age_sum")
        .orderBy("o_orderstatus")
    )


ORDER_AGE_BY_STATUS_SQL = """
WITH o AS (
  SELECT o_orderstatus,
         datediff('day', CAST(o_orderdate AS DATE),
                  (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
           AS age_d,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(MIN(age_d) AS BIGINT) AS min_age_d,
       CAST(MAX(age_d) AS BIGINT) AS max_age_d,
       CAST(SUM(age_d) // COUNT(*) AS BIGINT) AS mean_age_d
FROM o
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# monthly_revenue_per_customer (r11)
# ---------------------------------------------------------------------------


def monthly_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit economics trend: per month, revenue cents, distinct
    active customers, orders, and the two per-unit rates (cents per
    customer, cents per order — both integer DIV). Revenue growth
    with flat cents-per-customer is acquisition; growing
    cents-per-customer on flat acquisition is expansion —
    monthly_new_vs_repeat_revenue splits WHO pays, this prices HOW
    MUCH each payer is worth.

    Plan (100 TB): one (month) partial agg with an exact
    count-distinct over the orders scan — the distinct expands to
    (month, custkey) before the partial, still fact-bounded; rates
    are arithmetic on the ≤ months rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "year(CAST(o_orderdate AS DATE)) * 12 + "
            "month(CAST(o_orderdate AS DATE)) - 1"
        ).alias("m"),
        "o_custkey",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    return (
        o.groupBy("m")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .withColumn(
            "cents_per_customer",
            F.expr("CAST(revenue_cents DIV n_customers AS BIGINT)"),
        )
        .withColumn(
            "cents_per_order",
            F.expr("CAST(revenue_cents DIV n_orders AS BIGINT)"),
        )
        .orderBy("m")
    )


MONTHLY_REVENUE_PER_CUSTOMER_SQL = """
SELECT year(CAST(o_orderdate AS DATE)) * 12
         + month(CAST(o_orderdate AS DATE)) - 1 AS m,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // COUNT(DISTINCT o_custkey) AS BIGINT)
         AS cents_per_customer,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // COUNT(*) AS BIGINT) AS cents_per_order
FROM orders
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# nation_balance_contrast (r11)
# ---------------------------------------------------------------------------


def nation_balance_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided credit posture per nation: mean customer balance
    vs mean supplier balance (cents, integer DIV) and the signed gap
    — a nation whose customers run rich while suppliers run poor is
    a working-capital asymmetry the treasury wants to see.
    nation_customer_supplier_ratio contrasts COUNTS; this contrasts
    the MONEY. The two sides aggregate independently to ≤|nations|
    rows each before a nation-keyed join, so nothing fact-scale ever
    joins.

    Plan (100 TB): two dim-bounded partial aggs (customer, supplier
    are the small tables here but the shape holds for any size) →
    ≤|nations| join, nation dim broadcast for names."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(
                F.expr(
                    "CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) "
                    "AS BIGINT)"
                )
            ).cast("long").alias("cust_cents"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(
                F.expr(
                    "CAST(floor(s_acctbal * 100 + CAST(0.5 AS DOUBLE)) "
                    "AS BIGINT)"
                )
            ).cast("long").alias("supp_cents"),
        )
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        c.join(s, c["c_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name", "n_customers", "n_suppliers",
            F.expr("CAST(cust_cents DIV n_customers AS BIGINT)").alias(
                "mean_cust_cents"
            ),
            F.expr("CAST(supp_cents DIV n_suppliers AS BIGINT)").alias(
                "mean_supp_cents"
            ),
        )
        .withColumn(
            "gap_cents",
            F.expr("mean_cust_cents - mean_supp_cents"),
        )
        .orderBy("n_name")
    )


NATION_BALANCE_CONTRAST_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS cust_cents
  FROM customer GROUP BY 1
), s AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS supp_cents
  FROM supplier GROUP BY 1
)
SELECT n_name, n_customers, n_suppliers,
       CAST(cust_cents // n_customers AS BIGINT) AS mean_cust_cents,
       CAST(supp_cents // n_suppliers AS BIGINT) AS mean_supp_cents,
       CAST(cust_cents // n_customers - supp_cents // n_suppliers
            AS BIGINT) AS gap_cents
FROM c JOIN s ON c.nk = s.nk
JOIN nation ON c.nk = n_nationkey
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# brand_rank_stability (r11)
# ---------------------------------------------------------------------------


def brand_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competitive churn: per brand, how many months it was ranked
    (by monthly revenue, brand-name tie-break) in the top 5, its
    best and worst monthly rank, and the mean rank ×100 — a brand
    whose rank whipsaws is promotional noise, one that slowly sinks
    is a real share loss. Ranks are computed per month over the
    ≤ months·|brands| aggregated grid with a deterministic total
    order (revenue DESC, brand ASC), so both engines rank
    identically.

    Plan (100 TB): part is a dim — broadcast join; one
    (month, brand) partial agg off the fact scan; the rank window
    partitions per month on the bounded grid (never
    SinglePartition over fact rows); the final agg is ≤|brands|."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 12 + "
            "month(CAST(l_shipdate AS DATE)) - 1"
        ).alias("m"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    grid = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("m", "p_brand")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    ranked = grid.withColumn(
        "rnk",
        F.expr(
            "rank() OVER (PARTITION BY m "
            "ORDER BY rev_cents DESC, p_brand ASC)"
        ),
    )
    return (
        ranked.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum(F.expr("CASE WHEN rnk <= 5 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("months_top5"),
            F.min("rnk").cast("long").alias("best_rank"),
            F.max("rnk").cast("long").alias("worst_rank"),
            F.sum("rnk").cast("long").alias("rank_sum"),
        )
        .withColumn(
            "mean_rank_x100",
            F.expr("CAST((rank_sum * 100) DIV n_months AS BIGINT)"),
        )
        .drop("rank_sum")
        .orderBy("p_brand")
    )


BRAND_RANK_STABILITY_SQL = """
WITH grid AS (
  SELECT year(CAST(l_shipdate AS DATE)) * 12
           + month(CAST(l_shipdate AS DATE)) - 1 AS m,
         p_brand,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand,
         rank() OVER (PARTITION BY m
                      ORDER BY rev_cents DESC, p_brand ASC) AS rnk
  FROM grid
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(SUM(CASE WHEN rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS months_top5,
       CAST(MIN(rnk) AS BIGINT) AS best_rank,
       CAST(MAX(rnk) AS BIGINT) AS worst_rank,
       CAST((SUM(rnk) * 100) // COUNT(*) AS BIGINT) AS mean_rank_x100
FROM ranked
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# priority_loyalty (r11)
# ---------------------------------------------------------------------------


def priority_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority stickiness: per order priority, how many multi-order
    customers use it EXCLUSIVELY (every one of their orders), their
    share of the priority's multi-order customer base (bp), and the
    loyal customers' order volume. A priority whose users never mix
    is a real product tier; one everybody mixes is a checkout
    afterthought. Single-order customers are excluded (exclusivity
    is vacuous on one order).

    Plan (100 TB): one per-(customer, priority) partial agg, folded
    to one per-customer row carrying its ≤|priorities| priority SET
    (bounded — never a count-distinct over raw facts), then ONE
    explode back out and a ≤|priorities| agg — single lattice pass,
    no self-join, no second branch re-evaluating the upstream."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    per_cp = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    per_cust = per_cp.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_prios"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.collect_set("o_orderpriority").alias("prios"),
    )
    exploded = per_cust.where("n_orders >= 2").select(
        "n_prios",
        "n_orders",
        F.explode("prios").alias("o_orderpriority"),
    )
    return (
        exploded.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.expr("CASE WHEN n_prios = 1 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("loyal_customers"),
            F.sum(
                F.expr("CASE WHEN n_prios = 1 THEN n_orders ELSE 0 END")
            )
            .cast("long")
            .alias("loyal_orders"),
        )
        .withColumn(
            "loyal_share_bp",
            F.expr(
                "CAST((loyal_customers * 10000) DIV n_customers "
                "AS BIGINT)"
            ),
        )
        .orderBy("o_orderpriority")
    )


PRIORITY_LOYALTY_SQL = """
WITH per_cp AS (
  SELECT o_custkey, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
), per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_prios, SUM(n_orders) AS n_orders,
         list(o_orderpriority) AS prios
  FROM per_cp GROUP BY 1
), exploded AS (
  SELECT n_prios, n_orders,
         unnest(prios) AS o_orderpriority
  FROM per_cust WHERE n_orders >= 2
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_prios = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS loyal_customers,
       CAST(SUM(CASE WHEN n_prios = 1 THEN n_orders ELSE 0 END)
            AS BIGINT) AS loyal_orders,
       CAST((SUM(CASE WHEN n_prios = 1 THEN 1 ELSE 0 END) * 10000)
            // COUNT(*) AS BIGINT) AS loyal_share_bp
FROM exploded
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# supplier_revenue_deciles (r11)
# ---------------------------------------------------------------------------


def supplier_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-side concentration: suppliers ranked into revenue
    deciles — per decile, supplier count, total revenue cents, the
    decile's revenue share (bp), and the boundary values. The
    balance twin (supplier_balance_deciles) ranks by CREDIT; this
    ranks by what each supplier actually SHIPPED — together they
    split 'big book, small flow' suppliers from the real backbone.
    Decile assignment is exact global NTILE via the two-phase
    boundary-broadcast primitive (operators/tiling.py) under the
    (revenue DESC, suppkey ASC) total order — bit-identical to the
    plain-SQL ntile the oracle runs, no SinglePartition window.

    Plan (100 TB): one per-supplier partial agg off the fact scan;
    the tiling's two plan-build jobs are memoized per process
    (cache_ns) and the assignment phase is per-bucket windows; the
    final agg is exactly 10 cells."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    from ensembl_lakehouse_spark.operators.tiling import with_global_ntile

    tiled = with_global_ntile(
        per_supp, "rev_cents", "l_suppkey", 10, "decile",
        descending=True, cache_ns="supplier_revenue_deciles",
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("rev_cents").cast("long").alias("decile_cents"),
            F.min("rev_cents").cast("long").alias("min_cents"),
            F.max("rev_cents").cast("long").alias("max_cents"),
        )
        .withColumn(
            "revenue_share_bp",
            F.expr(
                "CAST((CAST(decile_cents AS DECIMAL(38,0)) * 10000) "
                "DIV (SUM(decile_cents) OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("decile")
    )


SUPPLIER_REVENUE_DECILES_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1
), tiled AS (
  SELECT rev_cents,
         ntile(10) OVER (ORDER BY rev_cents DESC, l_suppkey ASC)
           AS decile
  FROM per_supp
), grid AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(rev_cents) AS BIGINT) AS decile_cents,
         CAST(MIN(rev_cents) AS BIGINT) AS min_cents,
         CAST(MAX(rev_cents) AS BIGINT) AS max_cents
  FROM tiled GROUP BY 1
)
SELECT decile, n_suppliers, decile_cents, min_cents, max_cents,
       CAST((CAST(decile_cents AS HUGEINT) * 10000)
            // SUM(decile_cents) OVER () AS BIGINT) AS revenue_share_bp
FROM grid
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# order_width_monthly (r11)
# ---------------------------------------------------------------------------


def order_width_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-width trend: per month, orders, lines, quantity, and
    the two per-order rates (lines per order ×100, quantity per
    order ×100). order_width_histogram is the static distribution;
    this is its TIME SERIES — a shrinking lines-per-order under
    growing order counts is basket fragmentation (more shipments per
    revenue dollar). The month is the ORDER's month; lines attach by
    the co-keyed orderkey join.

    Plan (100 TB): per-order line partials first (orderkey partial
    agg off the lineitem scan), then the co-keyed join to orders and
    one ≤ months agg — the join carries |orders| rows, never raw
    lines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "year(CAST(o_orderdate AS DATE)) * 12 + "
            "month(CAST(o_orderdate AS DATE)) - 1"
        ).alias("m"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
            .cast("long")
            .alias("qty"),
        )
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
        .withColumn(
            "lines_per_order_x100",
            F.expr("CAST((n_lines * 100) DIV n_orders AS BIGINT)"),
        )
        .withColumn(
            "qty_per_order_x100",
            F.expr("CAST((total_qty * 100) DIV n_orders AS BIGINT)"),
        )
        .orderBy("m")
    )


ORDER_WIDTH_MONTHLY_SQL = """
WITH li AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
)
SELECT year(CAST(o_orderdate AS DATE)) * 12
         + month(CAST(o_orderdate AS DATE)) - 1 AS m,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST((SUM(n_lines) * 100) // COUNT(*) AS BIGINT)
         AS lines_per_order_x100,
       CAST((SUM(qty) * 100) // COUNT(*) AS BIGINT)
         AS qty_per_order_x100
FROM orders JOIN li ON o_orderkey = l_orderkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# first_order_value_matrix (r11)
# ---------------------------------------------------------------------------


def first_order_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation-quality matrix: each customer's FIRST order value
    band (date then orderkey tie-break — deterministic) crossed with
    their LIFETIME value band, cell count plus the share of the
    first-band row (bp). The diagonal says first impressions
    predict; mass above it says small first orders grow into big
    accounts (so don't gate onboarding on first-order size).
    customer_value_migration tracks period-to-period moves; this
    anchors on the very first transaction.

    Plan (100 TB): one per-customer partial agg computing BOTH the
    first-order pick (min_by over the composite date-orderkey key)
    and the lifetime sum in a single pass; banding is map-only on
    the ≤|customers| lattice; the grid is ≤ 4·4 cells."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(o_orderdate AS DATE)").alias("od"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.expr(
            "min_by(cents, struct(od, o_orderkey))"
        ).alias("first_cents"),
        F.sum("cents").cast("long").alias("ltv_cents"),
    )

    def band(col: str) -> str:
        return (
            f"CASE WHEN {col} < 100000 THEN 'a_lt1k' "
            f"WHEN {col} < 1000000 THEN 'b_lt10k' "
            f"WHEN {col} < 10000000 THEN 'c_lt100k' "
            "ELSE 'd_ge100k' END"
        )

    grid = (
        per_cust.select(
            F.expr(band("first_cents")).alias("first_band"),
            F.expr(band("ltv_cents")).alias("ltv_band"),
        )
        .groupBy("first_band", "ltv_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    return (
        grid.withColumn(
            "row_share_bp",
            F.expr(
                "(n_customers * 10000) DIV (SUM(n_customers) OVER "
                "(PARTITION BY first_band))"
            ),
        )
        .orderBy("first_band", "ltv_band")
    )


FIRST_ORDER_VALUE_MATRIX_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), firsts AS (
  -- DuckDB min_by has no struct-key overload, so the deterministic
  -- first-order pick runs as a window instead (same total order)
  SELECT o_custkey, cents AS first_cents
  FROM (SELECT o_custkey, cents,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY od, o_orderkey) AS rn
        FROM o)
  WHERE rn = 1
), per_cust AS (
  SELECT o.o_custkey,
         MAX(f.first_cents) AS first_cents,
         CAST(SUM(o.cents) AS BIGINT) AS ltv_cents
  FROM o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY 1
), banded AS (
  SELECT CASE WHEN first_cents < 100000 THEN 'a_lt1k'
              WHEN first_cents < 1000000 THEN 'b_lt10k'
              WHEN first_cents < 10000000 THEN 'c_lt100k'
              ELSE 'd_ge100k' END AS first_band,
         CASE WHEN ltv_cents < 100000 THEN 'a_lt1k'
              WHEN ltv_cents < 1000000 THEN 'b_lt10k'
              WHEN ltv_cents < 10000000 THEN 'c_lt100k'
              ELSE 'd_ge100k' END AS ltv_band
  FROM per_cust
), grid AS (
  SELECT first_band, ltv_band,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM banded GROUP BY 1, 2
)
SELECT first_band, ltv_band, n_customers,
       (n_customers * 10000)
         // CAST(SUM(n_customers) OVER (PARTITION BY first_band)
                 AS BIGINT) AS row_share_bp
FROM grid
ORDER BY first_band, ltv_band
"""


# ---------------------------------------------------------------------------
# brand_quarter_growth (r11)
# ---------------------------------------------------------------------------


def brand_quarter_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand momentum: per (brand, quarter), revenue cents plus the
    quarter-over-quarter growth in bp (vs the brand's PREVIOUS
    OBSERVED quarter — a brand absent a quarter compares across the
    gap, stated in the contract). orders_quarter_growth tracks the
    whole book; this decomposes the momentum by brand so a flat
    total can still show the portfolio rotating. The lag window
    partitions per brand over the ≤ brands·quarters grid.

    Plan (100 TB): part is a dim — broadcast join; one
    (brand, quarter) partial agg off the fact scan; lag + growth
    arithmetic on the bounded grid only. First observed quarter has
    no baseline → NULL growth (kept, not dropped)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "year(CAST(l_shipdate AS DATE)) * 4 + "
            "(quarter(CAST(l_shipdate AS DATE)) - 1)"
        ).alias("q"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    grid = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "q")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    return (
        grid.withColumn(
            "prev_cents",
            F.expr(
                "lag(rev_cents) OVER (PARTITION BY p_brand ORDER BY q)"
            ),
        )
        .withColumn(
            # a per-(brand, quarter) cents sum ×10⁴ passes BIGINT at
            # the 100 TB target — DECIMAL(38,0) numerator, truncating
            # DIV (the lift-op rule; the oracle uses HUGEINT //)
            "qoq_growth_bp",
            F.expr(
                "CAST(CASE WHEN prev_cents IS NULL THEN NULL "
                "ELSE ((CAST(rev_cents AS DECIMAL(38,0)) - prev_cents) "
                "* 10000) DIV prev_cents "
                "END AS BIGINT)"
            ),
        )
        .orderBy("p_brand", "q")
    )


BRAND_QUARTER_GROWTH_SQL = """
WITH grid AS (
  SELECT p_brand,
         year(CAST(l_shipdate AS DATE)) * 4
           + (quarter(CAST(l_shipdate AS DATE)) - 1) AS q,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand, q, rev_cents,
       CAST(lag(rev_cents) OVER (PARTITION BY p_brand ORDER BY q)
            AS BIGINT) AS prev_cents,
       CAST(CASE WHEN lag(rev_cents) OVER (PARTITION BY p_brand
                                           ORDER BY q) IS NULL
                 THEN NULL
                 ELSE ((CAST(rev_cents AS HUGEINT) - lag(rev_cents)
                          OVER (PARTITION BY p_brand ORDER BY q))
                       * 10000)
                      // lag(rev_cents) OVER (PARTITION BY p_brand
                                              ORDER BY q)
            END AS BIGINT) AS qoq_growth_bp
FROM grid
ORDER BY p_brand, q
"""


# ---------------------------------------------------------------------------
# net_multiplier_bands (r11)
# ---------------------------------------------------------------------------


def net_multiplier_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-realization audit: each line's net multiplier
    (1−discount)(1+tax) in fixed-point ×10⁴, banded (<90 % / <97 % /
    <103 % / <110 % / higher), per band: lines, gross cents, net
    cents, and the band's share of gross (bp). The grid says how
    much of the book transacts materially below list (deep-discount
    exposure) vs above (tax-heavy jurisdictions).
    lineitem_discount_effectiveness prices discount ROI; this is the
    two-factor NET of discount and tax together. The multiplier
    fixes to ×10⁴ per row before banding (floor + 0.5 — the cents
    rule), so band edges are engine-exact; net cents round per row
    from the gross-cents × multiplier product in DECIMAL.

    Plan (100 TB): map-only fixed-point arithmetic + banding → one
    ≤5-cell partial agg; the share window runs on that."""
    # conditional l_orderkey spread (guide §2.5): map-only
    # fixed-point banding is the whole cost; integer sums invariant
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey").select(
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("gross_cents"),
        F.expr(
            "CAST(floor((CAST(1.0 AS DOUBLE) - l_discount) * "
            "(CAST(1.0 AS DOUBLE) + l_tax) * 10000 + "
            "CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("mult_x10k"),
    )
    banded = li.select(
        "gross_cents",
        "mult_x10k",
        F.expr(
            "CASE WHEN mult_x10k < 9000 THEN 'a_deep_discount' "
            "WHEN mult_x10k < 9700 THEN 'b_discounted' "
            "WHEN mult_x10k < 10300 THEN 'c_near_list' "
            "WHEN mult_x10k < 11000 THEN 'd_tax_heavy' "
            "ELSE 'e_premium' END"
        ).alias("band"),
        F.expr(
            "CAST((CAST(gross_cents AS DECIMAL(38,0)) * mult_x10k) "
            "DIV 10000 AS BIGINT)"
        ).alias("net_cents"),
    )
    grid = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("gross_cents").cast("long").alias("gross_cents"),
        F.sum("net_cents").cast("long").alias("net_cents"),
    )
    return (
        grid.withColumn(
            "gross_share_bp",
            F.expr(
                "CAST((CAST(gross_cents AS DECIMAL(38,0)) * 10000) "
                "DIV (SUM(gross_cents) OVER ()) AS BIGINT)"
            ),
        )
        .orderBy("band")
    )


NET_MULTIPLIER_BANDS_SQL = """
WITH li AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           AS gross_cents,
         CAST(floor((1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5)
              AS BIGINT) AS mult_x10k
  FROM lineitem
), banded AS (
  SELECT gross_cents,
         CASE WHEN mult_x10k < 9000 THEN 'a_deep_discount'
              WHEN mult_x10k < 9700 THEN 'b_discounted'
              WHEN mult_x10k < 10300 THEN 'c_near_list'
              WHEN mult_x10k < 11000 THEN 'd_tax_heavy'
              ELSE 'e_premium' END AS band,
         CAST((CAST(gross_cents AS HUGEINT) * mult_x10k) // 10000
              AS BIGINT) AS net_cents
  FROM li
), grid AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(gross_cents) AS BIGINT) AS gross_cents,
         CAST(SUM(net_cents) AS BIGINT) AS net_cents
  FROM banded GROUP BY 1
)
SELECT band, n_lines, gross_cents, net_cents,
       CAST((CAST(gross_cents AS HUGEINT) * 10000)
            // SUM(gross_cents) OVER () AS BIGINT) AS gross_share_bp
FROM grid
ORDER BY band
"""


# ---------------------------------------------------------------------------
# docid_continuity_audit (r11)
# ---------------------------------------------------------------------------


def docid_continuity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-loss audit: per source, the doc_id span it covers
    ([min, max]), its doc count, the ids MISSING inside its own span
    that belong to NO other source (true corpus holes vs interleaved
    sources), and the corpus-global hole count repeated per row for
    the headline. A pipeline that lost a shard shows as a hole
    cluster; interleaved sources legitimately pock each other's
    spans, which is why the per-source 'missing' alone would
    over-alarm — the global hole count is the real loss signal.

    Plan (100 TB): one ≤|sources| partial agg (min/max/count) plus
    ONE global 3-value agg broadcast back — no per-id work, pure
    arithmetic on the aggregates (span − count identities)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id"
    )
    per_src = docs.groupBy("source").agg(
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    glob = docs.agg(
        F.min("doc_id").cast("long").alias("g_min"),
        F.max("doc_id").cast("long").alias("g_max"),
        F.count(F.lit(1)).cast("long").alias("g_docs"),
    )
    return (
        per_src.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "min_id",
            "max_id",
            "n_docs",
            F.expr("max_id - min_id + 1 - n_docs").alias(
                "span_missing"
            ),
            F.expr("g_max - g_min + 1 - g_docs").alias(
                "corpus_holes"
            ),
        )
        .orderBy("source")
    )


DOCID_CONTINUITY_AUDIT_SQL = """
WITH per_src AS (
  SELECT source,
         CAST(MIN(doc_id) AS BIGINT) AS min_id,
         CAST(MAX(doc_id) AS BIGINT) AS max_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), corpus AS (
  SELECT CAST(MIN(doc_id) AS BIGINT) AS g_min,
         CAST(MAX(doc_id) AS BIGINT) AS g_max,
         CAST(COUNT(*) AS BIGINT) AS g_docs
  FROM documents
)
SELECT source, min_id, max_id, n_docs,
       CAST(max_id - min_id + 1 - n_docs AS BIGINT) AS span_missing,
       CAST(g_max - g_min + 1 - g_docs AS BIGINT) AS corpus_holes
FROM per_src CROSS JOIN corpus
ORDER BY source
"""


# ---------------------------------------------------------------------------
# linenumber_price_profile (r11 batch 4)
# ---------------------------------------------------------------------------


def linenumber_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-position economics: lineitems grouped by their position
    within the order (l_linenumber 1–7) with volume, mean line value
    and mean discount. A basket whose later lines are systematically
    cheaper (or deeper-discounted) is add-on behavior; flat curves
    mean position carries no signal and basket models can drop it.
    The one TPC-H dimension no other report in the inventory uses.

    Integer-exact: cents via the corpus-wide floor(×100+0.5) idiom,
    discount in bp, means by integer DIV.

    Plan (100 TB): ONE partial agg map-side-combines the fact scan
    to ≤7 rows; the share window runs on that grid. No joins."""
    li = load_table(spark, sf_dir, "lineitem")
    grid = li.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            )
        ).alias("value_cents"),
        F.sum(
            F.expr(
                "CAST(floor(l_discount * 10000 + CAST(0.5 AS DOUBLE)) "
                "AS BIGINT)"
            )
        ).alias("disc_bp_sum"),
    )
    return (
        grid.select(
            "l_linenumber",
            "n_lines",
            F.expr(
                "(n_lines * 10000) DIV (SUM(n_lines) OVER ())"
            ).alias("line_share_bp"),
            F.expr("value_cents DIV n_lines").alias("avg_value_cents"),
            F.expr("disc_bp_sum DIV n_lines").alias("avg_discount_bp"),
        )
        .orderBy("l_linenumber")
    )


LINENUMBER_PRICE_PROFILE_SQL = """
WITH grid AS (
  SELECT l_linenumber,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS value_cents,
         CAST(SUM(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT))
              AS BIGINT) AS disc_bp_sum
  FROM lineitem GROUP BY 1
)
SELECT l_linenumber, n_lines,
       (n_lines * 10000) // CAST(SUM(n_lines) OVER () AS BIGINT)
         AS line_share_bp,
       value_cents // n_lines AS avg_value_cents,
       disc_bp_sum // n_lines AS avg_discount_bp
FROM grid
ORDER BY l_linenumber
"""


# ---------------------------------------------------------------------------
# negative_lead_audit (r11 batch 4)
# ---------------------------------------------------------------------------


def negative_lead_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-order sanity screen: lineitems whose ship date
    precedes their order's order date — impossible in a real supply
    chain, so every hit is a timestamp-skew or backfill artifact.
    Reported per order priority (count, share bp, and mean days of
    negative lead among offenders) so a priority class whose feed
    systematically back-dates stands out from uniform clock noise.
    The temporal twin of docid_continuity_audit's id-space screen.

    Plan (100 TB): the one fact-fact shuffle join (lineitem ⋈ orders
    on orderkey, AQE-skew-splittable — the join_order_lineitem
    shape), immediately collapsed by a ≤5-row partial agg. Only
    orderkey/shipdate survive the scan projection."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        "o_orderpriority",
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), "
            "CAST(l_shipdate AS DATE))"
        ).alias("neg_lead_days"),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.expr("CASE WHEN neg_lead_days > 0 THEN 1 ELSE 0 END")
            ).alias("early_lines"),
            F.sum(
                F.expr(
                    "CASE WHEN neg_lead_days > 0 THEN neg_lead_days "
                    "ELSE 0 END"
                )
            ).alias("early_days_sum"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            "early_lines",
            F.expr("(early_lines * 10000) DIV n_lines").alias(
                "early_share_bp"
            ),
            F.expr(
                "CASE WHEN early_lines > 0 "
                "THEN early_days_sum DIV early_lines ELSE 0 END"
            ).alias("avg_early_days"),
        )
        .orderBy("o_orderpriority")
    )


NEGATIVE_LEAD_AUDIT_SQL = """
WITH joined AS (
  SELECT o.o_orderpriority,
         datediff('day', CAST(l.l_shipdate AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS neg_lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN neg_lead_days > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS early_lines,
       (CAST(SUM(CASE WHEN neg_lead_days > 0 THEN 1 ELSE 0 END)
             AS BIGINT) * 10000) // CAST(COUNT(*) AS BIGINT)
         AS early_share_bp,
       CASE WHEN SUM(CASE WHEN neg_lead_days > 0 THEN 1 ELSE 0 END) > 0
            THEN CAST(SUM(CASE WHEN neg_lead_days > 0
                               THEN neg_lead_days ELSE 0 END) AS BIGINT)
                 // CAST(SUM(CASE WHEN neg_lead_days > 0 THEN 1 ELSE 0 END)
                         AS BIGINT)
            ELSE 0 END AS avg_early_days
FROM joined
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# unit_price_band_mix (r11 batch 4)
# ---------------------------------------------------------------------------


def unit_price_band_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-economics mix: lineitems banded by PER-UNIT price
    (extendedprice/quantity — the actual part price paid, which
    extendedprice alone conflates with basket size) crossed with
    return flag: volume, revenue share, and return exposure per
    band. If returns concentrate in the luxury band, inspection
    effort should follow the unit price, not the line total.

    TPC-H quantities are integral by construction; the unit price
    lands in exact cents via BIGINT DIV (both engines floor toward
    zero on positive operands).

    Plan (100 TB): map-only banding on the fact scan, ONE partial
    agg to a ≤5·3 grid; the share window runs on the grid."""
    li = load_table(spark, sf_dir, "lineitem")
    banded = li.select(
        "l_returnflag",
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT) DIV CAST(l_quantity AS BIGINT)"
        ).alias("unit_cents"),
        F.expr(
            "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("line_cents"),
    ).select(
        "l_returnflag",
        "line_cents",
        F.expr(
            "CASE WHEN unit_cents <= 50000 THEN 'a_budget' "
            "WHEN unit_cents <= 150000 THEN 'b_value' "
            "WHEN unit_cents <= 300000 THEN 'c_mid' "
            "WHEN unit_cents <= 600000 THEN 'd_premium' "
            "ELSE 'e_luxury' END"
        ).alias("band"),
    )
    grid = banded.groupBy("band", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("line_cents").alias("revenue_cents"),
    )
    return (
        grid.select(
            "band",
            "l_returnflag",
            "n_lines",
            "revenue_cents",
            # DECIMAL(38,0) numerator: a band's cents approach the
            # corpus total (~2.3e18 at SF 100k), and ×10⁴ in BIGINT
            # wraps silently (r11 code review — the same class the
            # r10 overflow sweep fixed)
            F.expr(
                "CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 10000) "
                "DIV (SUM(revenue_cents) OVER ()) AS BIGINT)"
            ).alias("revenue_share_bp"),
            F.expr(
                "(n_lines * 10000) DIV (SUM(n_lines) OVER "
                "(PARTITION BY band))"
            ).alias("band_flag_share_bp"),
        )
        .orderBy("band", "l_returnflag")
    )


UNIT_PRICE_BAND_MIX_SQL = """
WITH banded AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS line_cents,
         CASE WHEN u <= 50000 THEN 'a_budget'
              WHEN u <= 150000 THEN 'b_value'
              WHEN u <= 300000 THEN 'c_mid'
              WHEN u <= 600000 THEN 'd_premium'
              ELSE 'e_luxury' END AS band
  FROM (
    SELECT l_returnflag, l_extendedprice,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             // CAST(l_quantity AS BIGINT) AS u
    FROM lineitem)
), grid AS (
  SELECT band, l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(line_cents) AS BIGINT) AS revenue_cents
  FROM banded GROUP BY 1, 2
)
SELECT band, l_returnflag, n_lines, revenue_cents,
       CAST((CAST(revenue_cents AS HUGEINT) * 10000)
            // SUM(revenue_cents) OVER () AS BIGINT)
         AS revenue_share_bp,
       (n_lines * 10000) // CAST(SUM(n_lines) OVER (PARTITION BY band)
                                 AS BIGINT) AS band_flag_share_bp
FROM grid
ORDER BY band, l_returnflag
"""


# ---------------------------------------------------------------------------
# order_total_reconciliation (r11 batch 5)
# ---------------------------------------------------------------------------


def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value tie-out audit: does ``o_totalprice`` equal the order's
    line-level gross (extendedprice net of discount, plus tax)?
    Reported per order status: mean/max absolute discrepancy and the
    share of orders landing within 1 % of their own header total. On
    a correctly ingested TPC-H feed the discrepancy is rounding
    cents; on this fixture the header totals are synthetic and the
    audit quantifies exactly how far they drift — which is the
    point: a feed whose header/detail tie-out breaks is unusable
    for finance extracts regardless of row counts matching
    (audit_referential checks existence; this checks VALUE).

    Integer-exact: per-line net = gross_cents × (10⁴−disc_bp) ×
    (10⁴+tax_bp) / 10⁸, all in BIGINT — the product is ENTITY-
    bounded (one line's gross ≤ ~10⁷ cents at any SF, so the triple
    product peaks ~10¹⁵ ≪ 2⁶³; a DECIMAL(38,0) first cut cost 2×
    the whole operator in decimal128 arithmetic for headroom the
    bound proves unnecessary). Factors fixed-point BEFORE any
    product — no float products cross engines.

    Plan (100 TB): lineitem partial-aggs to |orders| rows on the
    orderkey it then joins orders on — one co-keyed fact-fact
    shuffle, AQE-skew-splittable — then a ≤|statuses| agg."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "(CAST(floor(l_extendedprice * 100 + "
                "CAST(0.5 AS DOUBLE)) AS BIGINT) "
                "* (10000 - CAST(floor(l_discount * 10000 + "
                "CAST(0.5 AS DOUBLE)) AS BIGINT)) "
                "* (10000 + CAST(floor(l_tax * 10000 + "
                "CAST(0.5 AS DOUBLE)) AS BIGINT))) "
                "DIV 100000000"
            )
        ).alias("lines_cents")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(
            "CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT)"
        ).alias("header_cents"),
    )
    joined = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey
    ).select(
        "o_orderstatus",
        "header_cents",
        F.expr("abs(header_cents - lines_cents)").alias("abs_diff"),
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("SUM(abs_diff) DIV COUNT(1)").alias(
                "mean_abs_diff_cents"
            ),
            F.max("abs_diff").alias("max_abs_diff_cents"),
            F.sum(
                F.expr(
                    "CASE WHEN abs_diff * 100 <= header_cents "
                    "THEN 1 ELSE 0 END"
                )
            ).alias("within_1pct"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "mean_abs_diff_cents",
            "max_abs_diff_cents",
            F.expr("(within_1pct * 10000) DIV n_orders").alias(
                "tieout_1pct_bp"
            ),
        )
        .orderBy("o_orderstatus")
    )


ORDER_TOTAL_RECONCILIATION_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         CAST(SUM((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (10000 - CAST(floor(l_discount * 10000 + 0.5)
                                   AS BIGINT))
                   * (10000 + CAST(floor(l_tax * 10000 + 0.5)
                                   AS BIGINT)))
                  // 100000000) AS BIGINT) AS lines_cents
  FROM lineitem GROUP BY 1
), joined AS (
  SELECT o.o_orderstatus,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
           AS header_cents,
         abs(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
             - p.lines_cents) AS abs_diff
  FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(abs_diff) // COUNT(*) AS BIGINT) AS mean_abs_diff_cents,
       CAST(MAX(abs_diff) AS BIGINT) AS max_abs_diff_cents,
       (CAST(SUM(CASE WHEN abs_diff * 100 <= header_cents
                      THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         // CAST(COUNT(*) AS BIGINT) AS tieout_1pct_bp
FROM joined
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
