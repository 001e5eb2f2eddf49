"""Remaining TPC-H query shapes expressible over the testdata schema.

The reference delegates arbitrary report SQL to ``spark.sql(query)``
(reference box_ingest.py / box_export.py:36), so the full TPC-H shape
catalogue is in-scope query surface. Round 1/2 covered Q1/Q3/Q5/Q11/
Q14/Q15/Q22; this module adds the rest that the available columns can
express (lineitem has no commitdate/receiptdate/shipmode, orders no
comment — those predicates are adapted, shapes preserved):

- Q4  → :func:`tpch_q4_late_order_priority` (EXISTS semi-join + agg)
- Q6  → :func:`tpch_q6_forecast_revenue` (pure filter-agg scan)
- Q7  → :func:`tpch_q7_nation_trade_volume` (dual-direction dim filter)
- Q8  → :func:`tpch_q8_market_share` (share-of-group CASE aggregate)
- Q10 → :func:`tpch_q10_returned_items` (join + agg + top-k)
- Q13 → :func:`tpch_q13_order_distribution` (outer join, agg-of-agg)
- Q17 → :func:`tpch_q17_small_qty_revenue` (per-key avg join-back)
- Q18 → :func:`tpch_q18_large_volume_customers` (HAVING filter join)
- Q19 → :func:`tpch_q19_disjunctive_revenue` (OR-of-ANDs pushdown)
- Q21 → :func:`tpch_q21_last_shipper` (argmax-per-group join-back)

Scale notes (100 TB design):

- Every dim join (nation/customer/supplier/part) carries an explicit
  ``broadcast`` hint; only fact-fact joins (orders⋈lineitem) shuffle,
  and both sides hash on the SAME key (orderkey) so AQE can coalesce.
- Q17/Q21's per-key aggregate join-backs reuse the join key partition
  (partkey / orderkey) — Catalyst plans one exchange feeding both the
  aggregate and the join probe, no second full scan shuffle.
- Date-range filters are literal predicates on scan columns →
  parquet ``PushedFilters`` + footer min/max row-group pruning.
- Money math follows the ``functions`` decimal conventions so results
  hash-match DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_tool_spark.functions import (
    SQL_REVENUE,
    dec,
    revenue,
)
from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change — the purest scan shape.

    No join, one filtered scan, one 1-row aggregate: at 100 TB this is
    bandwidth-bound, so the whole query cost is how little you read.
    All three predicates push to parquet (shipdate min/max prunes row
    groups; discount/quantity prune pages), and only 4 of 11 columns
    are scanned."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


TPCH_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def tpch_q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, by direction and
    year.

    Scale shape: supplier/customer/nation are broadcast; the only
    shuffle is orders⋈lineitem on orderkey. The nation-pair filter
    applies to the broadcast sides BEFORE the fact join, so ~1/n² of
    customers/suppliers survive into the probe."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.year("l_shipdate").alias("l_year"),
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(revenue()).cast("double").alias("volume"))
    )


TPCH_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share of PROMO-part revenue into
    one region, by year — conditional share-of-total as a CASE inside
    the same aggregate (never two scans, never a self-join).

    Scale shape: part/customer/nation/region/supplier broadcast;
    orders⋈lineitem is the single shuffle. The part-type filter cuts
    the probe side at the broadcast build."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = revenue()
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = f"""
SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {SQL_REVENUE}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
WHERE o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1997-01-01'
GROUP BY 1
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.

    Scale shape: date-filtered orders shuffle-join lineitem on
    orderkey; customer/nation broadcast onto the small aggregate
    output, not the fact stream; TakeOrderedAndProject (not a global
    sort) finishes the top-20. Deterministic tie-break on custkey."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(revenue()).cast("double").alias("lost_revenue"))
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey", "c_name", F.col("n_name").alias("nation"),
            F.col("c_acctbal"), "lost_revenue",
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS lost_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1995-10-01' AND o.o_orderdate < DATE '1996-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, zero-order
    customers included — outer join + aggregate-of-aggregate.

    Scale shape: orders pre-aggregates to one row per customer BEFORE
    joining (per-cust count is map-side combinable), the outer join is
    then dim-sized on both sides, and the second aggregate is over
    |customers| rows, not |orders|."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COALESCE(o.n, 0) AS c_count
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) o
    ON c.c_custkey = o.o_custkey
)
GROUP BY c_count
"""


def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue that tiny orders of one brand
    represent — a per-part average joined back onto the same rows.

    Scale shape: the brand filter broadcasts ~1/|brands| of part onto
    lineitem first; the per-part avg aggregates THAT reduced stream and
    joins back on partkey — both sides of the join-back hash on
    partkey, so Catalyst reuses one exchange. Never a window over the
    raw fact table, never a driver scalar."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


TPCH_Q17_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
JOIN (
  SELECT l2.l_partkey AS a_partkey,
         CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM lineitem l2
  JOIN part p2 ON l2.l_partkey = p2.p_partkey AND p2.p_brand = 'Brand#23'
  GROUP BY 1
) a ON l.l_partkey = a.a_partkey
WHERE l.l_quantity < 0.2 * a.avg_qty
"""


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order totalling > 300 units.

    Scale shape: the HAVING filter runs on the per-orderkey aggregate
    (map-side combinable) so only qualifying orderkeys — a tiny set —
    reach the joins; orders joins on orderkey reusing the aggregate's
    partitioning, customer broadcasts onto the survivors."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


TPCH_Q18_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       big.total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 300
) big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
"""


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs predicate spanning both
    join sides — the classic disjunction-pushdown test.

    Scale shape: part broadcasts; Catalyst extracts the common
    brand/size membership into a pushable filter on the build side and
    the quantity bounds onto the probe scan, so neither side carries
    rows that no disjunct can accept."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


TPCH_Q19_SQL = f"""
SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def tpch_q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking via EXISTS. The testdata
    lacks commit/receipt dates, so "late" is adapted to any lineitem
    shipping > 90 days after the order date — the EXISTS semi-join
    shape (never a row-multiplying inner join + distinct) is the point.

    Scale shape: Catalyst rewrites EXISTS to a left-semi hash join on
    orderkey; the date filter prunes orders at the scan; the aggregate
    output is |priorities| rows."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


def tpch_q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who shipped LAST on multi-supplier
    finished orders — argmax-per-group composed with a join-back (the
    testdata lacks receipt/commit dates, so "kept the order waiting"
    is adapted to "owned the latest shipdate").

    Scale shape: one per-orderkey aggregate (max shipdate + distinct
    suppliers, both map-side combinable) joined back on orderkey —
    exchange reuse, no window over the raw fact. Orders' status filter
    broadcasts nothing; it rides the orderkey shuffle."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fin = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).drop("o_orderkey")
    per_order = fin.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    ).filter(F.col("n_supp") >= 2)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        fin.join(
            per_order,
            (F.col("l_orderkey") == F.col("g_orderkey"))
            & (F.col("l_shipdate") == F.col("max_ship")),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


TPCH_Q21_SQL = """
WITH fin AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS g_orderkey, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM fin GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) >= 2
)
SELECT s.s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM fin f
  JOIN per_order p
    ON f.l_orderkey = p.g_orderkey AND f.l_shipdate = p.max_ship
) w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


def tpch_q9_profit_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and
    year. The testdata lacks partsupp, so supply cost is proxied as
    60% of the part's retail price — the SHAPE (fact ⋈ fact ⋈ three
    broadcast dims, computed measure, two-key agg) is the point.

    Scale shape: part/supplier/nation broadcast; orders⋈lineitem is
    the one real shuffle (orderkey); the profit expression is exact
    decimal so the oracle hash matches."""
    # '%gear%' matches ~13% of synthetic part names; the original
    # '%3%' matched none, so driver greens only ever hashed an empty
    # result (r11 verdict item 4)
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    ).select("p_partkey", "p_retailprice")
    s_ = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = revenue() - dec("p_retailprice") * F.lit(0.6).cast(
        "decimal(12,2)"
    ) * dec("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


TPCH_Q9_SQL = f"""
SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       CAST(SUM({SQL_REVENUE}
                - CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(0.6 AS DECIMAL(12,2))
                  * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the testdata schema has no partsupp
    table, so "supply cost" is each supplier's average unit price for
    the part derived from lineitem): for small ECONOMY parts, the
    EUROPE supplier(s) offering the minimum cost, by account balance.

    Scale shape: every dim edge (part slice, supplier⋈nation⋈region)
    broadcasts; the fact stream aggregates once per (part, supplier),
    and Q2's correlated MIN subquery becomes a window over partkey on
    that already-aggregated (dims-sized) stream — one fact shuffle
    total, no second scan, no join-back. Costs divide exact decimal
    sums, so the min-equality filter is reproducible cross-engine."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 5))
        .select("p_partkey", "p_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    costs = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("double")
                / F.sum(dec("l_quantity")).cast("double")
            ).alias("cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("cost", 6).alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


TPCH_Q2_SQL = """
WITH costs AS (
  SELECT l.l_partkey AS p_partkey, p.p_name, s.s_name, s.s_acctbal,
         n.n_name,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
             AND p.p_type = 'ECONOMY' AND p.p_size <= 5
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5
),
ranked AS (
  SELECT *, MIN(cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM costs
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(cost, 6) AS cost
FROM ranked WHERE cost = min_cost
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: lineitem has no shipmode/receiptdate
    — "late" is shipdate ≥ orderdate + 90 days, grouped by
    l_linestatus): late lines split into high- vs low-priority counts.

    Scale shape: the two-year shipdate window pushes to the lineitem
    scan (row-group pruning); the only shuffle is orders⋈lineitem on
    orderkey, and the priority classification is a COUNT(CASE) codegen
    aggregate on the joined stream."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            >= F.date_add("o_orderdate", 90).cast("timestamp_ntz")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT l.l_linestatus,
       COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate >= CAST(o.o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)
GROUP BY 1
"""


def tpch_q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the partsupp link comes from
    lineitem, and the "complaints" supplier exclusion is negative
    account balance): how many distinct suppliers can source each
    (type, size) part family, excluding flagged suppliers.

    Scale shape: the part slice broadcasts; the supplier exclusion is
    a broadcast ANTI join (never NOT IN's null-trap semantics on a
    shuffled side); the distinct-count aggregate dedups (type, size,
    suppkey) partial-first, so the final shuffle carries distinct
    triples, not raw lineitem."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 3, 5, 7, 9)
        )
        .select("p_partkey", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_size IN (1, 3, 5, 7, 9)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


def tpch_q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty — a supplier has
    "excess stock" in a part when it shipped more than a quarter of
    the part's total 1997 volume): suppliers dominating the supply of
    any 'small' part, with their nations.

    Scale shape: nested aggregation stays on one partkey-partitioned
    stream (per-(part,supplier) sums re-aggregate to per-part totals
    without a second scan); the dominance test is exact decimal
    arithmetic (4·sup_qty > part_qty — quantities are integral, so no
    float boundary); the surviving supplier keys are dim-sized and
    broadcast into a LEFT SEMI join against the supplier dim."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_ps = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("sup_qty"))
    )
    # per-part totals as a window over the already-aggregated stream:
    # reuses the (part, supplier) reduction, no join-back re-shuffle
    # of the fact data
    part_qty = F.sum("sup_qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        per_ps.withColumn("part_qty", part_qty)
        .filter(F.col("sup_qty") * 4 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


TPCH_Q20_SQL = """
WITH per_ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS sup_qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
per_p AS (
  SELECT l_partkey, SUM(sup_qty) AS part_qty FROM per_ps GROUP BY 1
),
dominant AS (
  SELECT DISTINCT per_ps.l_suppkey
  FROM per_ps JOIN per_p USING (l_partkey)
  WHERE per_ps.sup_qty * 4 > per_p.part_qty
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


SPECS: list[QuerySpec] = [
    QuerySpec("tpch_q2_min_cost_supplier", tpch_q2_min_cost_supplier,
              TPCH_Q2_SQL,
              "TPC-H Q2 shape: correlated-min supplier via window",
              ("join", "window", "tpch")),
    QuerySpec("tpch_q12_priority_shipping", tpch_q12_priority_shipping,
              TPCH_Q12_SQL,
              "TPC-H Q12 shape: late-line priority classification",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q16_part_supplier_variety", tpch_q16_part_supplier_variety,
              TPCH_Q16_SQL,
              "TPC-H Q16 shape: anti-join + distinct supplier count",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q20_dominant_part_suppliers",
              tpch_q20_dominant_part_suppliers, TPCH_Q20_SQL,
              "TPC-H Q20 shape: nested agg dominance semi-join",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q9_profit_shape", tpch_q9_profit_shape, TPCH_Q9_SQL,
              "TPC-H Q9 shape: two-fact profit agg with cost proxy",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q6_forecast_revenue", tpch_q6_forecast_revenue, TPCH_Q6_SQL,
              "TPC-H Q6: pure filter-agg scan (bandwidth-bound shape)",
              ("agg", "sql", "tpch")),
    QuerySpec("tpch_q7_nation_trade_volume", tpch_q7_nation_trade_volume,
              TPCH_Q7_SQL,
              "TPC-H Q7: dual-direction nation pair volume by year",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q8_market_share", tpch_q8_market_share, TPCH_Q8_SQL,
              "TPC-H Q8: conditional share-of-total market share",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q10_returned_items", tpch_q10_returned_items, TPCH_Q10_SQL,
              "TPC-H Q10: returned-item revenue top-20 customers",
              ("join", "agg", "topk", "tpch")),
    QuerySpec("tpch_q13_order_distribution", tpch_q13_order_distribution,
              TPCH_Q13_SQL,
              "TPC-H Q13: customer order-count distribution (outer join)",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q17_small_qty_revenue", tpch_q17_small_qty_revenue,
              TPCH_Q17_SQL,
              "TPC-H Q17: per-part avg join-back, small-quantity revenue",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q18_large_volume_customers", tpch_q18_large_volume_customers,
              TPCH_Q18_SQL,
              "TPC-H Q18: HAVING-filtered large-volume orders",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q19_disjunctive_revenue", tpch_q19_disjunctive_revenue,
              TPCH_Q19_SQL,
              "TPC-H Q19: OR-of-ANDs disjunctive predicate revenue",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q4_late_order_priority", tpch_q4_late_order_priority,
              TPCH_Q4_SQL,
              "TPC-H Q4 shape: EXISTS semi-join order-priority check",
              ("join", "agg", "tpch")),
    QuerySpec("tpch_q21_last_shipper", tpch_q21_last_shipper, TPCH_Q21_SQL,
              "TPC-H Q21 shape: last-shipping supplier on multi-supplier orders",
              ("join", "agg", "topk", "tpch")),
]
