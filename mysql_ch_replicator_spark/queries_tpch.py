"""Full TPC-H-shape analytic coverage (Q2-Q22 adaptations).

The replica the engine maintains (SURVEY.md §2) is read by analysts with
exactly these query shapes; this module completes the classic 22 on the
testdata's slimmed TPC-H schema.  Columns the testdata lacks (``partsupp``,
``l_commitdate``/``l_receiptdate``, ``o_comment``, ``c_phone``,
``p_container``) are substituted with equivalents that preserve each
query's *structure* — correlated scalar subqueries, EXISTS / NOT EXISTS
double correlation, outer-join histograms, view-over-max — because the
structure is what exercises the optimizer, not the literal predicate.

Cross-engine determinism follows queries.py's rules: every decimal surface
is pinned to an explicit ``DECIMAL(p,s)`` before its VARCHAR rendering,
ratios divide two exact decimal sums in double then ``round(.., 6)``,
integer counts use COUNT (DuckDB's SUM(int) is HUGEINT), ``year()`` is
cast to BIGINT on both sides, and every LIMIT carries a full tie-break.

Scale notes (100 TB): every query here is one-shuffle-per-agg with dim
joins broadcast; the fact table (lineitem) is never shuffled except on an
aggregation key it is about to be grouped by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import register
from .sources.snapshot import load_table


def _vol(price_col: str = "l_extendedprice",
         disc_col: str = "l_discount") -> F.Column:
    """Canonical revenue term: exact decimal, pinned to (28,4) so both
    engines render the identical fixed-point string."""
    price = F.col(price_col).cast("decimal(18,2)")
    disc = F.col(disc_col).cast("decimal(18,2)")
    return (price * (1 - disc)).cast("decimal(28,4)")


_VOL_SQL = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
            " AS DECIMAL(28,4))")


# ---------------------------------------------------------------------------
# Q2 — correlated-min supplier selection
# ---------------------------------------------------------------------------

@register(
    "q2_min_price_supplier",
    f"""
    WITH pl AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'STANDARD' AND p_size <= 10
    ),
    m AS (SELECT l_partkey, MIN(price) AS min_price FROM pl GROUP BY l_partkey)
    SELECT DISTINCT pl.l_partkey AS p_partkey, s.s_name,
           CAST(m.min_price AS VARCHAR) AS min_price
    FROM pl
    JOIN m ON pl.l_partkey = m.l_partkey AND pl.price = m.min_price
    JOIN supplier s ON s.s_suppkey = pl.l_suppkey
    """,
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — for each qualifying part, the supplier(s) that
    shipped it at its minimum price (correlated MIN subquery).  Spark form:
    groupBy-min then join back on (partkey, price) — both sides of that
    join are already hash-partitioned on l_partkey from the same scan, so
    the second shuffle co-locates for free; supplier is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pl = (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
          .select("l_partkey", "l_suppkey",
                  F.col("l_extendedprice").cast("decimal(18,2)").alias("price")))
    m = pl.groupBy("l_partkey").agg(F.min("price").alias("min_price"))
    return (pl.join(m, ["l_partkey"])
            .where(F.col("price") == F.col("min_price"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
            .select(F.col("l_partkey").alias("p_partkey"), "s_name",
                    F.col("min_price").cast("string").alias("min_price"))
            .distinct())


# ---------------------------------------------------------------------------
# Q4 — EXISTS semi-join + priority count
# ---------------------------------------------------------------------------

@register(
    "q4_priority_count",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — priority census of orders with at least one
    late-shipping line (ship > order + 30d stands in for the missing
    commit/receipt dates).  LEFT SEMI join keeps orders un-duplicated
    without a distinct; the quarter filter prunes the orders scan before
    the shuffle, and the semi join shuffles only (orderkey, dates)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_shipdate")
    quarter = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    late = (quarter.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi"))
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Q7 — bi-national volume shipping
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS VARCHAR) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_VOL_SQL} AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
          OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — cross-border revenue by nation pair, direction and
    year (region pair ASIA<->EUROPE rather than a single nation pair,
    which the small-SF supplier table can't guarantee to populate).
    supplier+nation+region collapse to broadcast maps; the orderkey join
    is the only big shuffle, and the pair filter runs before the final
    (3-key, tiny cardinality) aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nr = (n.join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
          .select("n_nationkey", "n_name", "r_name"))
    n1 = nr.select(F.col("n_nationkey").alias("s_nk"),
                   F.col("n_name").alias("supp_nation"),
                   F.col("r_name").alias("supp_region"))
    n2 = nr.select(F.col("n_nationkey").alias("c_nk"),
                   F.col("n_name").alias("cust_nation"),
                   F.col("r_name").alias("cust_region"))
    pair = ((F.col("supp_region") == "ASIA")
            & (F.col("cust_region") == "EUROPE")) | \
           ((F.col("supp_region") == "EUROPE")
            & (F.col("cust_region") == "ASIA"))
    shipping = (
        li.where((F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(pair))
    return (shipping
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("bigint").alias("l_year"))
            .agg(F.sum(_vol()).cast("string").alias("revenue")))


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_VOL_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — NATION_3 suppliers' share of ASIA-customer revenue
    per year: numerator and denominator are exact decimal sums in the SAME
    aggregate (one pass, one shuffle on year), divided once in double."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                   "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    asia_nations = (n.join(F.broadcast(r),
                           F.col("r_regionkey") == F.col("n_regionkey"))
                    .where(F.col("r_name") == "ASIA")
                    .select(F.col("n_nationkey").alias("c_nk")))
    supp_n = n.select(F.col("n_nationkey").alias("s_nk"),
                      F.col("n_name").alias("supp_nation"))
    vol = _vol()
    zero = F.lit(0).cast("decimal(28,4)")
    joined = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where((F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
               & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nk") == F.col("c_nationkey"),
              "left_semi")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nk") == F.col("s_nationkey")))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                 .otherwise(zero))
    den = F.sum(vol)
    return (joined
            .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.round(num.cast("double") / den.cast("double"), 6)
                  .alias("mkt_share")))


# ---------------------------------------------------------------------------
# Q9 — product-line profit by nation and year
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS VARCHAR) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_VOL_SQL} AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit on one product line grouped by supplier
    nation and order year (ps_supplycost doesn't exist here, so profit is
    the revenue term).  The part-name filter broadcasts and prunes
    lineitem before its only shuffle (the orders join on orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("%widget%")).select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"),
                "left_semi")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")))
    return (joined
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.sum(_vol()).cast("string").alias("sum_profit")))


# ---------------------------------------------------------------------------
# Q10 — returned-item top customers
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(volume) AS VARCHAR) AS revenue
    FROM (
      SELECT c_custkey, c_name, n_name, {_VOL_SQL} AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
    ) t
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM(volume) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by returned-merchandise revenue
    in a half-year.  Aggregate on custkey BEFORE attaching the name/nation
    dims would be ideal at extreme scale; here the dims are broadcast so
    the plan still shuffles lineitem only once (the orderkey join), then
    TakeOrdered(20) replaces a global sort.  Tie-break: c_custkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                   "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name",
                                                     "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.where(F.col("l_returnflag") == "R")
        .join(o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))),
            F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey")))
    agg = (joined.groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(_vol()).alias("rev")))
    return (agg.orderBy(F.col("rev").desc(), "c_custkey").limit(20)
            .select("c_custkey", "c_name", "n_name",
                    F.col("rev").cast("string").alias("revenue")))


# ---------------------------------------------------------------------------
# Q12 — shipping-delay buckets vs order priority
# ---------------------------------------------------------------------------

@register(
    "q12_ship_delay_priority",
    """
    SELECT delay_bucket,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                    THEN 'fast'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                    THEN 'normal'
                  ELSE 'slow' END AS delay_bucket
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ) t
    GROUP BY delay_bucket
    """,
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional priority counts per shipping-delay
    bucket (l_shipmode doesn't exist; ship-lag buckets carry the same
    CASE-pivot structure).  One orderkey shuffle, then a 3-row aggregate;
    COUNT(CASE) not SUM so both engines emit BIGINT."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderpriority",
                                                   "o_orderdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(lag <= 30, "fast")
              .when(lag <= 90, "normal")
              .otherwise("slow"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey")))
    return (joined.groupBy(bucket.alias("delay_bucket"))
            .agg(F.count(F.when(high, 1)).alias("high_line_count"),
                 F.count(F.when(~high, 1)).alias("low_line_count")))


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@register(
    "q13_order_count_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — histogram of orders-per-customer including the
    zero bucket (LEFT OUTER join, COUNT of the nullable key).  Two
    aggregates: the first shuffles on custkey, the second on the tiny
    c_count domain — the classic double-group-by."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


from . import queries_tpch2  # noqa: E402,F401
