"""TPC-H shapes, continued (Q11, Q15, Q16, Q17, Q20, Q21, Q22).

Same adaptation and determinism rules as queries_tpch.py — see that
module's docstring.  These seven carry the heavier correlation machinery:
scalar subqueries against a derived view (Q11, Q15, Q20, Q22), correlated
per-group averages (Q17), and EXISTS + NOT EXISTS double correlation
(Q21) — in Spark all are expressed as joins against a tiny aggregated
side (broadcast), never as per-row re-evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .sources.snapshot import load_table
from .queries_tpch import _vol, _VOL_SQL


# ---------------------------------------------------------------------------
# Q11 — revenue concentration (HAVING vs scalar subquery)
# ---------------------------------------------------------------------------

@register(
    "q11_revenue_concentration",
    f"""
    WITH pr AS (
      SELECT l_partkey, SUM({_VOL_SQL}) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS VARCHAR) AS val
    FROM pr
    WHERE CAST(val AS DOUBLE)
          > 1.5 * (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) FROM pr)
    """,
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts whose revenue exceeds 1.5x the average
    per-part revenue (partsupp value -> lineitem revenue; a
    fraction-of-total threshold goes empty as the part count grows, so
    the threshold is per-part-relative and scale-free).  The per-part
    aggregate is computed ONCE: both consumers hang off the same shuffle
    and AQE's ReuseExchange serves the scalar-threshold branch from the
    first branch's exchange — no persist (a leaked cache in a long-lived
    session, VERDICT r2 #3) and no second scan of lineitem.  The average
    divides the EXACT decimal sum in double (one deterministic rounding),
    never a native double AVG."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = (li.groupBy("l_partkey").agg(F.sum(_vol()).alias("val")))
    total = pr.agg((F.lit(1.5) * F.sum("val").cast("double")
                    / F.count(F.lit(1))).alias("thresh"))
    out = (pr.crossJoin(F.broadcast(total))
           .where(F.col("val").cast("double") > F.col("thresh"))
           .select("l_partkey", F.col("val").cast("string").alias("val")))
    return out


# ---------------------------------------------------------------------------
# Q15 — top supplier via revenue view + scalar max
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_VOL_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS VARCHAR) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) achieving the quarter's maximum
    revenue: a view-level aggregate consumed twice (rows + scalar MAX).
    The view materializes once — AQE ReuseExchange shares the suppkey
    aggregate's shuffle between the row branch and the 1-row MAX
    broadcast, no persist needed — and exact decimals make the equality
    safe cross-engine — the reason Q15 is notorious with doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # The explicit isNotNull keeps the two consumers of `revenue`
    # byte-identical: without it Catalyst infers isnotnull(supplier_no)
    # from the supplier join and pushes it into the ROW branch only,
    # making the scans differ and defeating ReuseExchange (a NULL suppkey
    # couldn't match the inner join anyway, so semantics are unchanged).
    revenue = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        & F.col("l_suppkey").isNotNull())
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol()).alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (revenue.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("max_rev"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("string")
                     .alias("total_revenue")))


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part group
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct-supplier count per (brand, type, size)
    (partsupp -> the lineitem supplier-part bridge).  COUNT DISTINCT
    expands to a two-phase aggregate: Catalyst first dedups
    (group-keys, suppkey) partially map-side, so the shuffle carries
    distinct pairs, not raw lineitems."""
    p = (load_table(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey",
                                                      "l_suppkey")
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated per-part average)
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    """
    WITH pa AS (
      SELECT l_partkey AS pa_partkey,
             0.2 * AVG(CAST(l_quantity AS DOUBLE)) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DECIMAL(28,2)) AS VARCHAR) AS small_qty_revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pa_partkey = l_partkey
    WHERE p_type = 'PROMO' AND CAST(l_quantity AS DOUBLE) < qty_thresh
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from orders below 20% of a part's average
    quantity: the correlated AVG subquery becomes a groupBy-avg joined
    back on partkey (both sides partitioned on the same key from the same
    scan).  Quantities are integer-valued, so the double AVG is exact and
    the < comparison is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_type") == "PROMO").select("p_partkey"))
    pa = (li.groupBy(F.col("l_partkey").alias("pa_partkey"))
          .agg((F.lit(0.2)
                * F.avg(F.col("l_quantity").cast("double")))
               .alias("qty_thresh")))
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"),
                    "left_semi")
            .join(pa, F.col("pa_partkey") == F.col("l_partkey"))
            .where(F.col("l_quantity").cast("double") < F.col("qty_thresh"))
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("decimal(28,2)").cast("string")
                  .alias("small_qty_revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


# ---------------------------------------------------------------------------
# Q20 — heavy suppliers of one product line (semi-join + scalar avg)
# ---------------------------------------------------------------------------

@register(
    "q20_heavy_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%bolt%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_qty AS DECIMAL(28,2)) AS VARCHAR) AS total_qty
    FROM supplier JOIN shipped ON l_suppkey = s_suppkey
    WHERE CAST(total_qty AS DOUBLE)
          > (SELECT AVG(CAST(total_qty AS DOUBLE)) FROM shipped)
    """,
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers who shipped an above-average quantity
    of one product line in a year (partsupp availability -> shipped
    volume).  The year+name filter prunes before the suppkey aggregate;
    the AVG threshold is scale-free (no hard-coded quantity), and exact:
    integer quantities sum exactly in both decimal and double.  The
    shipped aggregate feeds both the row branch and the scalar AVG via
    AQE ReuseExchange — one scan, no leaked persist."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("%bolt%")).select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    shipped = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"),
              "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
              .alias("total_qty")))
    avg_qty = shipped.agg(
        F.avg(F.col("total_qty").cast("double")).alias("avg_qty"))
    return (shipped.crossJoin(F.broadcast(avg_qty))
            .where(F.col("total_qty").cast("double") > F.col("avg_qty"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_qty").cast("decimal(28,2)").cast("string")
                     .alias("total_qty")))


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the sole late supplier on multi-supplier finished
    orders (late := ship > order + 60d, standing in for receipt >
    commit).  Spark form: instead of per-row EXISTS / NOT EXISTS, ONE
    per-order aggregate computes n_suppliers and n_late_suppliers, joined
    back to the late lines — two shuffles total on orderkey, both
    co-partitioned, vs the naive four correlated scans."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey",
                                                      "l_shipdate")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS")
    per_order = (lo.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.when(late, F.col("l_suppkey")))
                       .alias("n_late_supp")))
    waiting = (lo.where(late)
               .join(per_order.where((F.col("n_supp") > 1)
                                     & (F.col("n_late_supp") == 1)),
                     ["l_orderkey"], "left_semi"))
    return (waiting
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait")))


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (anti-join + scalar avg)
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_customers",
    """
    SELECT n_name, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                     AS DECIMAL(28,2)) AS VARCHAR) AS totacctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — customers with above-average balance who never
    placed an urgent order, by nation (c_phone country codes -> nation
    dim; "no orders at all" is empty at every test SF, so the NOT EXISTS
    correlates on the priority predicate instead).  The global average is
    sum(decimal)/count computed identically on both engines (never a
    native double AVG, whose summation order differs); the NOT EXISTS is
    a left-anti join on custkey — at scale orders projects to just
    (o_custkey) after its filter, before the anti-join shuffle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_acctbal",
                                                     "c_nationkey")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority") == "1-URGENT")
         .select("o_custkey"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    avg_bal = (c.where(F.col("c_acctbal") > 0.0)
               .agg((F.sum(bal).cast("double")
                     / F.count(F.lit(1))).alias("avg_bal")))
    return (c.crossJoin(F.broadcast(avg_bal))
            .where(bal.cast("double") > F.col("avg_bal"))
            .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
            .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(bal).cast("decimal(28,2)").cast("string")
                  .alias("totacctbal")))
