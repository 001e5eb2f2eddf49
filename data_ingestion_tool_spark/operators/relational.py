"""Relational query library: the SQL-delegated surface of the reference.

The reference executes arbitrary user SQL via ``spark.sql(query)``
(reference box_export.py:36), so "same query capabilities" means the
full join / aggregation / window / set-op / scalar-function surface.
Each operator here is a named, oracle-checked DataFrame program
(SURVEY.md §2.5-§2.9).

Scale notes (100 TB design):

- Dimension joins (region/nation/supplier/part/customer vs fact tables)
  carry explicit ``broadcast`` hints — at cluster scale the dimensions
  stay far below the broadcast threshold while lineitem/orders/events
  shard across executors; no shuffle of the fact side on the dim key.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew splitting and post-shuffle coalescing.
- Aggregations are expressed as single groupBy/agg so Catalyst plans
  partial (map-side) + final aggregation; no driver-side loops.
- Filters use literal predicates on the raw scan columns so they reach
  the parquet reader (PushedFilters), and every query selects only the
  columns it needs (ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_tool_spark.functions import (
    SQL_CHARGE,
    SQL_REVENUE,
    charge,
    dec,
    dec_avg,
    dec_sum,
    revenue,
    sql_dec_avg,
    sql_dec_sum,
)
from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.6)
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → groupBy → 8 aggregates.

    The flagship query: the exact shape an ``execute_export`` report
    query would take in the reference (box_export.py:36).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '2000-12-01 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(revenue()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dec_sum('l_quantity', 'sum_qty')},
  {sql_dec_sum('l_extendedprice', 'sum_base_price')},
  CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
  {sql_dec_avg('l_quantity', 'avg_qty')},
  {sql_dec_avg('l_extendedprice', 'avg_price')},
  {sql_dec_avg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain counts per group (hash agg w/ distinct)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dec_sum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


AGG_ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {sql_dec_sum('l_quantity', 'sum_qty')},
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(dec_sum("o_totalprice", "total_price"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "total_price",
            "n_orders",
        )
    )


AGG_CUBE_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       {sql_dec_sum('o_totalprice', 'total_price')},
       COUNT(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (``percentile_approx`` — Greenwald-Khanna
    under the hood): mergeable bounded-memory summaries per partition,
    so a 100 TB percentile costs one map-side-combined agg instead of a
    total sort. Accuracy 10000 → rank error ≤ n/10000. Rows-only driver
    check (sketch estimates are engine-specific); the rank-error bound
    vs the exact ordered-set aggregate is pytest-checked.

    Output boundary: the sketch returns ARRAY<double>, but registry
    outputs must be scalar columns (the driver canonicalizer cannot
    hash list cells) — the four quantiles are unpacked via element
    access in the same projection, still one agg job."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.9], 10000)
    return li.groupBy("l_returnflag").agg(q.alias("qs")).select(
        "l_returnflag",
        F.col("qs")[0].alias("price_q25"),
        F.col("qs")[1].alias("price_q50"),
        F.col("qs")[2].alias("price_q75"),
        F.col("qs")[3].alias("price_q90"),
    )


def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate: discrete p50/p90 of quantity per flag.

    Implemented as an explicit ``row_number`` pick (value at position
    ``ceil(q * n)`` in a totally-ordered partition) so Spark and the
    oracle share one definition — engine-native interpolating
    percentiles differ in formula across engines.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(F.col("pos") == F.ceil(F.col("n") * 0.5), F.col("l_quantity"))
        ).alias("p50_qty"),
        F.max(
            F.when(F.col("pos") == F.ceil(F.col("n") * 0.9), F.col("l_quantity"))
        ).alias("p90_qty"),
    )


AGG_QUANTILES_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity, l_orderkey, l_linenumber) AS pos,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN pos = CEIL(n * 0.5) THEN l_quantity END) AS p50_qty,
       MAX(CASE WHEN pos = CEIL(n * 0.9) THEN l_quantity END) AS p90_qty
FROM ranked GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5)
# ---------------------------------------------------------------------------


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, agg, ORDER BY + LIMIT (top-k).

    customer is broadcast (small dim); orders⋈lineitem shuffles once on
    the order key. Sort+limit plans as TakeOrderedAndProject.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '2000-07-01 00:00:00'")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '2000-07-01 00:00:00'")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


TOP_REVENUE_ORDERS_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
  AND l_shipdate > TIMESTAMP '2000-07-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact ⋈ broadcast dim chain → agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


REVENUE_BY_NATION_SQL = f"""
SELECT n_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null handling: per-customer order stats,
    customers with zero orders kept (coalesced to 0)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")).cast("double"), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


CUSTOMER_ORDER_STATS_SQL = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0)
         AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTI join (NOT EXISTS) — customers with no URGENT order: the
    unfiltered variant is empty at every SF (every synthetic customer
    orders), so its greens only ever hashed an empty frame (r11
    verdict item 4); the URGENT slice keeps the identical shape and
    returns 18/203/1986 rows at sf0.001/0.01/0.1."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI join (EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


CUSTOMERS_WITH_URGENT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def supplier_balance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join: supplier pairs where s1 out-balances s2,
    aggregated per nation of the richer supplier.

    Broadcast nested-loop on a deliberately small relation; a large
    theta join would instead be range-bucketed (see operators.events
    sessionization for the banded pattern).
    """
    s1 = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k1"),
        F.col("s_acctbal").alias("bal1"),
        F.col("s_nationkey").alias("nat1"),
    )
    s2 = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k2"), F.col("s_acctbal").alias("bal2")
    )
    return (
        s1.join(F.broadcast(s2), F.col("bal1") > F.col("bal2"))
        .groupBy("nat1")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dec(F.col("bal1")) - dec(F.col("bal2")))
            .cast("double")
            .alias("total_gap"),
        )
        .withColumnRenamed("nat1", "nationkey")
    )


SUPPLIER_BALANCE_PAIRS_SQL = """
SELECT s1.s_nationkey AS nationkey,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(s1.s_acctbal AS DECIMAL(12,2))
                - CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_gap
FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal > s2.s_acctbal
GROUP BY s1.s_nationkey
"""


def region_nation_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join of the two smallest dims (bounded cardinality)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    nation = _t(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


REGION_NATION_CROSS_SQL = "SELECT r_name, n_name FROM region CROSS JOIN nation"


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.7)
# ---------------------------------------------------------------------------


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per partition; top-5 per order status (ties kept
    by ``rank`` so the result set is deterministic)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
        )
        .filter(F.col("price_rank") <= 5)
    )


WINDOW_RANK_ORDERS_SQL = """
SELECT * FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
           AS price_rank,
         DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
           AS price_dense_rank
  FROM orders
) WHERE price_rank <= 5
"""


def window_lag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a totally-ordered per-customer sequence: gap in
    days between consecutive orders."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


WINDOW_LAG_ORDERS_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey) OVER w AS prev_orderkey,
       DATE_DIFF('day',
                 LAG(CAST(o_orderdate AS DATE)) OVER w,
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       LEAD(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame spec: running total of spend per customer (rows between
    unbounded preceding and current row, totally ordered)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spent"),
    )


WINDOW_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spent
FROM orders
"""


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (row_number ≤ 3 with total tiebreak) — the
    window-shaped generalization of the reference's latest-file top-1
    (box_ingest.py:44-50)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


TOPK_ORDERS_PER_CUSTOMER_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8)
# ---------------------------------------------------------------------------


def _custkeys_by_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select("o_custkey")


def set_union_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of 1995- and 1996-active customer keys."""
    a = _custkeys_by_year(spark, sf_dir, 1995)
    b = _custkeys_by_year(spark, sf_dir, 1996)
    return a.union(b).distinct()


SET_UNION_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
UNION
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
"""


def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both years."""
    a = _custkeys_by_year(spark, sf_dir, 1995)
    b = _custkeys_by_year(spark, sf_dir, 1996)
    return a.intersect(b)


SET_INTERSECT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
"""


def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1995 but not 1996."""
    a = _custkeys_by_year(spark, sf_dir, 1995)
    b = _custkeys_by_year(spark, sf_dir, 1996)
    return a.subtract(b)


SET_EXCEPT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
"""


def set_except_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each 1995 activity row survives
    once per unmatched multiplicity (a customer with three 1995 orders
    and one 1996 order keeps two rows). One hash-agg shuffle per side
    plus the count subtraction; no row-pair enumeration."""
    a = _custkeys_by_year(spark, sf_dir, 1995)
    b = _custkeys_by_year(spark, sf_dir, 1996)
    return a.exceptAll(b)


SET_EXCEPT_ALL_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
EXCEPT ALL
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
"""


def set_intersect_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: min(multiplicity) copies per
    key survive."""
    a = _custkeys_by_year(spark, sf_dir, 1995)
    b = _custkeys_by_year(spark, sf_dir, 1996)
    return a.intersectAll(b)


SET_INTERSECT_ALL_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
INTERSECT ALL
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
"""


def orders_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point —
    Catalyst rewrites both to semi/anti joins (no per-row subquery
    re-execution): customers holding an open ('O') order but no
    failed ('F') one."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders_ex o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        """
    )


ORDERS_EXISTS_SUBQUERY_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery (Spark ≥3.4 SQL): per
    high-balance customer, their two priciest orders. The planner
    rewrites the lateral into a per-key window top-k, so execution is
    one shuffle — not a per-customer subquery loop. Deterministic
    tiebreak (price DESC, orderkey ASC) keeps the oracle exact."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_acctbal > 9900
        """
    )


LATERAL_TOP_ORDERS_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_acctbal > 9900
"""


# ---------------------------------------------------------------------------
# Sort / limit (SURVEY §2.4)
# ---------------------------------------------------------------------------


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Scalar-function showcases (SURVEY §2.9)
# ---------------------------------------------------------------------------


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library parity: upper/substr/length/concat/replace/
    split_part/instr/like over part."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_brand").alias("brand_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_pos"),
        F.col("p_name").like("%green%").alias("is_green"),
        F.trim(F.lower("p_name")).alias("name_norm"),
    )


SCALAR_STRING_FUNCS_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       LENGTH(p_brand) AS brand_len,
       CONCAT_WS('/', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
       SPLIT_PART(p_type, ' ', 1) AS type_first_word,
       STRPOS(p_type, 'BRASS') AS brass_pos,
       (p_name LIKE '%green%') AS is_green,
       TRIM(LOWER(p_name)) AS name_norm
FROM part
"""


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library parity: extract/trunc/add/diff over orders."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE columns render inconsistently across engines' pandas
        # bridges; emit timestamps for stable cross-engine comparison.
        F.date_add(d, 30).cast("timestamp_ntz").alias("due_date"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
    )


SCALAR_DATE_FUNCS_SQL = """
SELECT o_orderkey,
       YEAR(o_orderdate) AS order_year,
       MONTH(o_orderdate) AS order_month,
       DAY(o_orderdate) AS order_day,
       QUARTER(o_orderdate) AS order_quarter,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
"""


def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + null-handling funcs, then re-aggregated."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.select(
            bucket.alias("price_bucket"),
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        )
        .groupBy("price_bucket", "status_or_null")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SCALAR_CONDITIONAL_FUNCS_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
"""


def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events ``props`` payload column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k_value").alias("k_sum"),
            F.max("k_value").alias("k_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SCALAR_JSON_EVENTS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Advanced joins: full/right outer, as-of (SURVEY §2.5 last row)
# ---------------------------------------------------------------------------


def orders_customers_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-customer order counts vs a customer subset;
    both null sides survive (customers with no orders, orders whose
    customer misses the filter)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    subset = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    return (
        per_cust.join(subset, per_cust.o_custkey == subset.c_custkey, "full")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            "c_name",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


ORDERS_CUSTOMERS_FULL_SQL = """
SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
       c.c_name AS c_name,
       COALESCE(o.n_orders, 0) AS n_orders
FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
  ON o.o_custkey = c.c_custkey
"""


def orders_right_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join at row level: every deep-debt customer kept,
    order keys null where no orders exist."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey"
    )


ORDERS_RIGHT_JOIN_CUSTOMERS_SQL = """
SELECT o.o_orderkey AS o_orderkey, c.c_custkey AS c_custkey
FROM orders o RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal < -900) c
  ON o.o_custkey = c.c_custkey
"""


def asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, expressed Spark-natively: for every purchase event,
    the most recent STRICTLY PRIOR non-purchase event of the same user.

    No O(n²) time-range join: one partition-by-user window with a
    ``last(..., ignorenulls)`` over rows (unbounded, -1) — the standard
    scalable as-of pattern (sort once per key, no pair enumeration).
    At 100 TB both sides shuffle once on user_id and the sort is
    spill-safe; contrast with a range theta-join which Spark would plan
    as a nested loop.
    """
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("prev_event_id", prior)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "prev_event_id")
    )


ASOF_LAST_EVENT_SQL = """
SELECT event_id, user_id, prev_event_id FROM (
  SELECT event_id, user_id, event_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_event_id
  FROM events
) WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Additional aggregation shapes (SURVEY §2.6)
# ---------------------------------------------------------------------------


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation — the
    general form of rollup/cube, via the engine's SQL surface (the
    reference's own query entry point, box_export.py:36)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_priority,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: distinct sorted priorities per status, joined
    to a string so the cross-engine comparison is on scalars."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_COLLECT_SETS_SQL = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts (the 100 TB path where exact
    COUNT DISTINCT's shuffle is the bottleneck). Estimator is
    engine-specific → rows-only driver check; the exact-vs-approx
    error bound is asserted in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


# ---------------------------------------------------------------------------
# Additional window shapes (SURVEY §2.7)
# ---------------------------------------------------------------------------


def explode_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF surface: parse the JSON props payload to a map
    and explode to (event_id, key, value) rows — one shuffle-free
    narrow transform. (The oracle mirrors the known single-key payload
    shape; Spark side is a genuine generic map explode.)"""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "value"),
    )
    return parsed


EXPLODE_EVENT_PROPS_SQL = """
SELECT event_id, 'k' AS key,
       CAST(json_extract_string(props, '$.k') AS INT) AS value
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


def priciest_order_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SQL-delegated surface): orders whose
    price equals their priority class's maximum. Catalyst rewrites the
    correlation to an aggregate + join; comparisons on doubles are
    exact, so the oracle agrees bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders_corr o
        WHERE o_totalprice = (SELECT MAX(i.o_totalprice)
                              FROM orders_corr i
                              WHERE i.o_orderpriority = o.o_orderpriority)
        """
    )


PRICIEST_ORDER_PER_PRIORITY_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(i.o_totalprice)
                      FROM orders i
                      WHERE i.o_orderpriority = o.o_orderpriority)
"""


def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per status. Pinned
    pivot values (no discovery pass); absent combos coalesce to 0 to
    match SQL FILTER semantics."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


PIVOT_STATUS_COUNTS_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def agg_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group (the
    ordered-set aggregate family; contrast agg_quantiles' discrete
    window-position variant). Rounded to absorb interpolation-formula
    1-ulp differences across engines."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(
            F.percentile("o_totalprice", F.lit(0.25)), 4
        ).alias("p25_price"),
        F.round(
            F.percentile("o_totalprice", F.lit(0.75)), 4
        ).alias("p75_price"),
    )


AGG_MEDIAN_PERCENTILES_SQL = """
SELECT o_orderstatus,
       ROUND(MEDIAN(o_totalprice), 4) AS median_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS p25_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS p75_price
FROM orders GROUP BY o_orderstatus
"""


def orders_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global ORDER BY (no limit): range-partitioned sort — the
    sampled-boundaries Exchange that keeps a total order distributed
    (contrast with top-k's TakeOrderedAndProject). Total order made
    deterministic with the unique key as tiebreak."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), "o_orderkey").select(
        "o_orderkey", "o_totalprice"
    )


ORDERS_GLOBAL_SORT_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey
"""


def set_union_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — duplicates kept), counted per key so
    the duplicate multiplicity is value-checked."""
    c = _t(spark, sf_dir, "customer")
    hi_bal = c.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        hi_bal.unionAll(building)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


SET_UNION_ALL_CUSTOMERS_SQL = """
SELECT c_custkey, COUNT(*) AS multiplicity FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 7000
  UNION ALL
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) GROUP BY c_custkey
"""


def orders_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries through the SQL entry point — Catalyst
    rewrites to semi/anti joins; NOT IN carries the null-aware twist."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_inq")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_inq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders_inq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_inq
                            WHERE c_acctbal > 9000)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM orders_inq
                                 WHERE o_orderstatus = 'P')
        """
    )


ORDERS_IN_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
"""


def null_safe_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): NULLIF-produced
    nulls compared without three-valued-logic surprises."""
    o = _t(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    b = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.groupBy(
        a.eqNullSafe(F.lit("F")).alias("status_is_f"),
        b.isNull().alias("urgent_nulled"),
    ).agg(F.count(F.lit(1)).alias("n"))


NULL_SAFE_COMPARE_SQL = """
SELECT NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS status_is_f,
       NULLIF(o_orderpriority, '1-URGENT') IS NULL AS urgent_nulled,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""


def scalar_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via VariantType (Spark 4): parse once into the
    binary variant encoding, then typed path extraction — the scale
    path for JSON-heavy tables (parse_json amortizes; repeated
    get_json_object re-parses the string per call)."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count("k").alias("n_with_k"),
        )
    )


SCALAR_VARIANT_EVENTS_SQL = """
SELECT event_type,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
       COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k
FROM events GROUP BY event_type
"""


def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function library: construct, merge, filter, and
    introspect maps built from scalar columns; outputs flattened to
    scalars for cross-engine comparison."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.map_concat(
        F.create_map(F.lit("status"), F.col("o_orderstatus")),
        F.create_map(F.lit("priority"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.array_join(F.map_values(m), "|").alias("vals"),
        F.size(F.map_filter(m, lambda k, v: v.startswith("1"))).alias(
            "n_urgentish"
        ),
        F.element_at(m, "status").alias("status"),
    )


SCALAR_MAP_FUNCS_SQL = """
SELECT o_orderkey,
       'status,priority' AS keys,
       o_orderstatus || '|' || o_orderpriority AS vals,
       CAST(o_orderstatus LIKE '1%' AS INT)
         + CAST(o_orderpriority LIKE '1%' AS INT) AS n_urgentish,
       o_orderstatus AS status
FROM orders WHERE o_orderkey < 500
"""


def scalar_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + counting over text (beyond rlike):
    first number-like token and occurrences of a word per document."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)_?(\d+)?", 1).alias("first_word"),
        F.regexp_count("text", F.lit(r"\bvalue\b")).alias("n_value"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_nonspace"),
    )


SCALAR_REGEX_EXTRACT_SQL = r"""
SELECT doc_id,
       COALESCE(regexp_extract(text, '([a-z]+)_?(\d+)?', 1), '') AS first_word,
       len(regexp_extract_all(text, '\bvalue\b')) AS n_value,
       length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
FROM documents
"""


def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated dimension (no source scan): a day-level calendar from
    the orders date span — sequence + explode, the generator the
    engine uses to build date/number dims without ingesting one."""
    o = _t(spark, sf_dir, "orders")
    span = o.select(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    return (
        span.select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
        )
        .select(
            F.col("d").cast("timestamp_ntz").alias("day"),
            F.year("d").alias("year"),
            F.month("d").alias("month"),
            F.dayofweek("d").alias("dow"),
        )
    )


CALENDAR_DIM_SQL = """
WITH span AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
  FROM orders
)
SELECT CAST(d AS TIMESTAMP) AS day,
       YEAR(d) AS year,
       MONTH(d) AS month,
       DAYOFWEEK(d) + 1 AS dow
FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM span)
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: lineitem ⋈ broadcast(part), CASE-filtered
    revenue share of promo parts per ship year."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = revenue()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(promo).cast("double").alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


PROMO_REVENUE_SQL = f"""
SELECT YEAR(l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_REVENUE}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_rev,
       CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_rev,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, did signup → click → purchase happen
    in event-time order? One shuffle on user_id; stage timestamps are
    conditional MINs, the sequence test is plain comparisons."""
    e = _t(spark, sf_dir, "events")
    t_of = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        t_of("signup").alias("t_signup"),
        t_of("click").alias("t_click"),
        t_of("purchase").alias("t_purchase"),
    )
    converted = (
        F.col("t_signup").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_signup") <= F.col("t_click"))
        & (F.col("t_click") <= F.col("t_purchase"))
    )
    return per_user.select(
        "user_id", converted.cast("int").alias("converted")
    )


USER_FUNNEL_SQL = """
SELECT user_id,
       CAST(t_signup IS NOT NULL AND t_click IS NOT NULL
            AND t_purchase IS NOT NULL
            AND t_signup <= t_click AND t_click <= t_purchase
            AS INT) AS converted
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
"""


def scalar_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map function library over constructed collections: build
    per-row arrays from scalar columns, then sort/slice/filter/reduce
    them — the collection-manipulation surface an export query can use.
    Outputs are scalars so the cross-engine comparison is exact."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    arr = F.array("l_quantity", "l_discount", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_max(arr).alias("arr_max"),
        F.array_min(arr).alias("arr_min"),
        F.size(F.array_distinct(arr)).alias("n_distinct"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("arr_sum"),
        F.size(F.filter(arr, lambda x: x > 0.05)).alias("n_over"),
        F.array_join(
            F.transform(F.array_sort(arr), lambda x: F.round(x, 2).cast("string")),
            "|",
        ).alias("sorted_joined"),
    )


SCALAR_ARRAY_MAP_FUNCS_SQL = """
SELECT l_orderkey, l_linenumber,
       list_max(a) AS arr_max,
       list_min(a) AS arr_min,
       len(list_distinct(a)) AS n_distinct,
       ROUND(list_sum(a), 6) AS arr_sum,
       len(list_filter(a, x -> x > 0.05)) AS n_over,
       array_to_string(list_transform(list_sort(a),
                                      x -> CAST(ROUND(x, 2) AS VARCHAR)), '|')
           AS sorted_joined
FROM (SELECT l_orderkey, l_linenumber,
             [l_quantity, l_discount, l_tax] AS a
      FROM lineitem WHERE l_orderkey < 200)
"""


_PROFILE_COLS = (
    "o_orderstatus",
    "o_orderpriority",
    "o_custkey",
    "o_totalprice",
)


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator (the pre-ingest sanity pass the
    reference's validation implies): per-column row/null/distinct
    counts + min/max, computed in ONE aggregate scan — metrics for all
    columns evaluate in the same partial agg, then unpivot to long
    form with ``stack``. The oracle scans once per column (UNION ALL);
    at 100 TB the single-pass shape is the difference between one read
    and |columns| reads. Numerics stringify through DECIMAL(12,2) so
    both engines format identically."""
    o = _t(spark, sf_dir, "orders")

    def native(c: str) -> F.Column:
        # min/max run on the NATIVE type (string-first would compare
        # lexicographically); only the result stringifies.
        col = F.col(c)
        return dec(col) if dict(o.dtypes)[c] == "double" else col

    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            m
            for c in _PROFILE_COLS
            for m in (
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__distinct"),
                F.min(native(c)).cast("string").alias(f"{c}__min"),
                F.max(native(c)).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_val, max_val)",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def _profile_sql_branch(c: str, numeric: bool) -> str:
    cast = f"CAST({c} AS DECIMAL(12,2))" if numeric else c
    return f"""
SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({cast}) AS VARCHAR) AS min_val,
       CAST(MAX({cast}) AS VARCHAR) AS max_val
FROM orders"""


PROFILE_ORDERS_SQL = " UNION ALL ".join(
    _profile_sql_branch(c, c == "o_totalprice") for c in _PROFILE_COLS
)


def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in linear-regression aggregates (``regr_*`` — Spark ≥3.5):
    OLS slope/intercept/R² of extendedprice on quantity per return
    flag, computed as one map-side-combinable aggregate pass (the
    moment sums), never a per-group fit loop. Rounded to 6 decimals:
    accumulation order differs across engines at ~1e-15."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "price_intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


AGG_REGRESSION_SQL = """
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS price_per_qty,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS price_intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
       REGR_COUNT(l_extendedprice, l_quantity) AS n_pairs
FROM lineitem GROUP BY l_returnflag
"""


def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: correlation, covariance, stddev.
    Accumulation order differs across engines at ~1e-15; rounding to 6
    decimals makes the comparison exact while still value-checking."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("stddev_qty"),
    )


AGG_STATISTICS_SQL = """
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_POP(l_quantity, l_discount), 6) AS covar_qty_disc,
       ROUND(STDDEV_POP(l_quantity), 6) AS stddev_qty
FROM lineitem GROUP BY l_returnflag
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (``sampleBy``): per-language fractions — the
    corpus rebalancing step of a training-data pipeline. Sampling is
    engine-specific (seeded Bernoulli per row) → rows-only check;
    per-stratum rates are asserted in tests. The cross-engine
    deterministic twins are ``doc_sample_balanced`` /
    ``temperature_mixed_sample`` (md5-uniform draws, oracle-paired,
    driver-checkable)."""
    d = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``DataFrame.unpivot`` / SQL UNPIVOT): per-flag
    metric totals melted to (flag, metric, val) — the melt operator the
    reference's SQL surface reaches via UNPIVOT."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_price"),
        dec_sum("l_discount", "sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "metric",
        "val",
    )


UNPIVOT_LINEITEM_METRICS_SQL = f"""
UNPIVOT (
  SELECT l_returnflag,
         {sql_dec_sum('l_quantity', 'sum_qty')},
         {sql_dec_sum('l_extendedprice', 'sum_price')},
         {sql_dec_sum('l_discount', 'sum_disc')}
  FROM lineitem GROUP BY l_returnflag
) ON sum_qty, sum_price, sum_disc INTO NAME metric VALUE val
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (Catalyst decorrelates to an
    aggregate + join): orders strictly above their customer's average
    order value. The predicate is stated in exact integer×decimal form
    (price·n > sum) so both engines compare identical values — a
    double AVG would make the boundary engine-dependent."""
    from data_ingestion_tool_spark.sources.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_corr_v"
    )
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders_corr_v o
        WHERE CAST(o_totalprice AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM orders_corr_v o2
                 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 FROM orders_corr_v o2
                 WHERE o2.o_custkey = o.o_custkey)
        """
    )


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(12,2))
      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2)))
         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


def window_rank_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: percent_rank, cume_dist,
    nth_value — deterministic total order (price desc, orderkey) so
    rank ties cannot differ across engines."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_best"),
    )


WINDOW_RANK_EXTRAS_SQL = """
SELECT o_orderkey, o_custkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       NTH_VALUE(o_orderkey, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_best
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def agg_trimmed_mean_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG ``pandas_udf`` (the UDAF
    surface, SURVEY §2.12): 10%-trimmed mean of order value per
    priority. Arrow ships each group's column to one vectorized numpy
    reduction; partial aggregation doesn't apply to opaque UDAFs, so
    groups must fit per-executor — right for low-cardinality keys like
    priority (5 groups), wrong for user-level keys (use built-ins
    there).

    Rank-based trim (drop ⌊n·0.1⌋ from each end of the sorted values,
    in cents) keeps the result integer-exact across engines.
    """
    import pandas as pd

    # NB: explicit __annotations__ because this module uses
    # `from __future__ import annotations`, which stringifies hints and
    # breaks pandas_udf's GROUPED_AGG signature inference.
    def trimmed_sum_cents(v):
        cents = v.sort_values().to_numpy()
        k = int(len(cents) * 0.1)
        kept = cents[k : len(cents) - k] if len(cents) > 2 * k else cents
        return int(kept.sum())

    trimmed_sum_cents.__annotations__ = {"v": pd.Series, "return": int}
    trimmed_sum_cents = F.pandas_udf("long")(trimmed_sum_cents)

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    src = o.select("o_orderpriority", cents.alias("cents"))
    # a GROUPED_AGG pandas UDF cannot share an agg with built-ins
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count comes from a second
    # tiny aggregate joined back (5 groups; AQE broadcasts it)
    trimmed = src.groupBy("o_orderpriority").agg(
        trimmed_sum_cents("cents").alias("trimmed_sum_cents")
    )
    counts = src.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    return trimmed.join(counts, "o_orderpriority")


AGG_TRIMMED_MEAN_PANDAS_SQL = """
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN rn > CAST(FLOOR(n * 0.1) AS BIGINT)
                      AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
                     THEN cents ELSE 0 END) AS BIGINT) AS trimmed_sum_cents,
       COUNT(*) AS n
FROM ranked
GROUP BY o_orderpriority
"""


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): nation names
    per region, sorted so the concatenation is deterministic."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
            "nation_list"
        ),
    )


AGG_STRING_CONCAT_SQL = """
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nation_list
FROM nation GROUP BY n_regionkey
"""


SPECS_STATS = [
    QuerySpec("unpivot_lineitem_metrics", unpivot_lineitem_metrics,
              UNPIVOT_LINEITEM_METRICS_SQL,
              "wide→long UNPIVOT/melt reshape", ("agg", "scalar")),
    QuerySpec("orders_above_customer_avg", orders_above_customer_avg,
              ORDERS_ABOVE_CUSTOMER_AVG_SQL,
              "correlated scalar subqueries (decorrelated by Catalyst)",
              ("join", "agg")),
    QuerySpec("window_rank_extras", window_rank_extras,
              WINDOW_RANK_EXTRAS_SQL,
              "percent_rank/cume_dist/nth_value window family",
              ("window",)),
    QuerySpec("agg_string_concat", agg_string_concat, AGG_STRING_CONCAT_SQL,
              "ordered LISTAGG/STRING_AGG concatenation", ("agg",)),
    QuerySpec("agg_trimmed_mean_pandas", agg_trimmed_mean_pandas,
              AGG_TRIMMED_MEAN_PANDAS_SQL,
              "custom UDAF via GROUPED_AGG pandas_udf (trimmed mean)",
              ("agg", "udf")),
    QuerySpec("scalar_regex_extract", scalar_regex_extract,
              SCALAR_REGEX_EXTRACT_SQL,
              "regex group extraction/count/replace", ("scalar", "text")),
    QuerySpec("agg_median_percentiles", agg_median_percentiles,
              AGG_MEDIAN_PERCENTILES_SQL,
              "exact interpolated percentiles + median", ("agg",)),
    QuerySpec("orders_global_sort", orders_global_sort,
              ORDERS_GLOBAL_SORT_SQL,
              "full global ORDER BY (range-partitioned sort)", ("sort",)),
    QuerySpec("set_union_all_customers", set_union_all_customers,
              SET_UNION_ALL_CUSTOMERS_SQL,
              "UNION ALL bag semantics with multiplicity check", ("setop",)),
    QuerySpec("orders_in_subquery", orders_in_subquery,
              ORDERS_IN_SUBQUERY_SQL,
              "IN / null-aware NOT IN subqueries", ("join",)),
    QuerySpec("null_safe_compare", null_safe_compare, NULL_SAFE_COMPARE_SQL,
              "null-safe equality (IS NOT DISTINCT FROM)", ("scalar",)),
    QuerySpec("scalar_variant_events", scalar_variant_events,
              SCALAR_VARIANT_EVENTS_SQL,
              "VariantType semi-structured extraction (parse once)",
              ("scalar",)),
    QuerySpec("scalar_map_funcs", scalar_map_funcs, SCALAR_MAP_FUNCS_SQL,
              "map construct/merge/filter/introspect library", ("scalar",)),
    QuerySpec("calendar_dim", calendar_dim, CALENDAR_DIM_SQL,
              "generated day-level calendar dimension", ("scalar",)),
    QuerySpec("promo_revenue", promo_revenue, PROMO_REVENUE_SQL,
              "fact ⋈ broadcast(part) CASE-revenue (TPC-H Q14 shape)",
              ("join", "agg")),
    QuerySpec("user_funnel", user_funnel, USER_FUNNEL_SQL,
              "ordered signup→click→purchase funnel per user",
              ("events", "agg")),
    QuerySpec("scalar_array_map_funcs", scalar_array_map_funcs,
              SCALAR_ARRAY_MAP_FUNCS_SQL,
              "array construction/sort/filter/reduce library", ("scalar",)),
    QuerySpec("agg_statistics", agg_statistics, AGG_STATISTICS_SQL,
              "corr/covar/stddev aggregate family", ("agg",)),
    QuerySpec("stratified_sample_docs", stratified_sample_docs, None,
              "per-stratum Bernoulli sampling (corpus rebalancing)",
              ("agg", "text")),
]


def window_ntile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a deterministic total
    order (price, key) per priority class."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


WINDOW_NTILE_ORDERS_SQL = """
SELECT o_orderkey,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: how many orders in the same priority
    fall within $5000 below this order's price. Frame bounds are
    comparisons on the ordering value → deterministic under ties."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 0)
    )
    return o.select(
        "o_orderkey", F.count(F.lit(1)).over(w).alias("n_similar")
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT o_orderkey,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_similar
FROM orders
"""


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-diff / reconciliation: classify every key across two
    snapshots of a table as added / removed / changed (unchanged rows
    are dropped) — the audit primitive behind incremental-load
    verification, CDC replay checks, and blue/green table swaps.

    The two snapshots are derived deterministically from ``orders``
    (old = keys not divisible by 97; new = keys not divisible by 89,
    with prices bumped on keys divisible by 101) so the oracle can
    rebuild them exactly.

    Scale shape: ONE full-outer equi-join on the table key — both
    sides shuffle once on o_orderkey; with bucketed/identically
    partitioned snapshots (the normal warehouse layout) the exchange
    disappears entirely. Change detection compares the projected
    columns null-safely; for wide tables, compare a per-side
    ``xxhash64(concat_ws(...))`` row hash instead so the shuffle
    carries (key, hash) rather than every column."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    old = o.filter(k % 97 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("old_price"),
        F.col("o_orderstatus").alias("old_status"),
        F.lit(1).alias("in_old"),
    )
    new = (
        o.filter(k % 89 != 0)
        .select(
            "o_orderkey",
            F.when(k % 101 == 0, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice"))
            .alias("new_price"),
            F.col("o_orderstatus").alias("new_status"),
            F.lit(1).alias("in_new"),
        )
    )
    j = old.join(new, "o_orderkey", "full")
    status = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(
            ~F.col("old_price").eqNullSafe(F.col("new_price"))
            | ~F.col("old_status").eqNullSafe(F.col("new_status")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            "o_orderkey",
            status.alias("status"),
            "old_price",
            "new_price",
        )
        .filter(F.col("status") != "unchanged")
    )


ORDERS_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS old_price, o_orderstatus AS old_status,
         1 AS in_old
  FROM orders WHERE o_orderkey % 97 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS new_price,
         o_orderstatus AS new_status, 1 AS in_new
  FROM orders WHERE o_orderkey % 89 <> 0
)
SELECT o_orderkey,
       CASE WHEN in_old IS NULL THEN 'added'
            WHEN in_new IS NULL THEN 'removed'
            WHEN old_price IS DISTINCT FROM new_price
                 OR old_status IS DISTINCT FROM new_status THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_price, new_price
FROM old FULL JOIN new USING (o_orderkey)
WHERE CASE WHEN in_old IS NULL THEN 'added'
           WHEN in_new IS NULL THEN 'removed'
           WHEN old_price IS DISTINCT FROM new_price
                OR old_status IS DISTINCT FROM new_status THEN 'changed'
           ELSE 'unchanged' END <> 'unchanged'
"""


def hierarchy_rollup_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchical rollup (Spark 4 ``WITH RECURSIVE``):
    every customer key walks its implicit binary-tree ancestry
    (``parent = key DIV 2``) and the rollup counts descendants per
    ancestor node — the org-chart / BOM / category-tree aggregation
    pattern, expressed in pure SQL with no driver-side loop.

    Scale shape: each recursion step is a narrow projection (integer
    halving) over the previous step — no join, no shuffle inside the
    loop — and depth is bounded by log2(keyspace) (~40 for int64), so
    the iteration count is independent of row count. The single
    shuffle is the final descendant-count hash-agg. For iterative
    algorithms that DO join per step, see dedup_near_clusters'
    localCheckpoint pattern instead."""
    c = _t(spark, sf_dir, "customer")
    c.select("c_custkey").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(custkey, node, depth) AS (
          SELECT c_custkey, CAST(c_custkey AS BIGINT), 0 FROM rcte_customer
          UNION ALL
          SELECT custkey, node DIV 2, depth + 1 FROM anc WHERE node > 1
        )
        SELECT node, COUNT(*) AS n_descendants, MAX(depth) AS max_depth
        FROM anc GROUP BY node
        ORDER BY n_descendants DESC, node
        LIMIT 20
        """
    )


HIERARCHY_ROLLUP_CTE_SQL = """
WITH RECURSIVE anc(custkey, node, depth) AS (
  SELECT c_custkey, CAST(c_custkey AS BIGINT), 0 FROM customer
  UNION ALL
  SELECT custkey, node // 2, depth + 1 FROM anc WHERE node > 1
)
SELECT node, COUNT(*) AS n_descendants, MAX(depth) AS max_depth
FROM anc GROUP BY node
ORDER BY n_descendants DESC, node
LIMIT 20
"""


#: Exact-percentile ceiling for ``winsorized_prices``: per-group row
#: counts above this switch the p01/p99 bound computation from the
#: positional rank window (exact, but serializes each group into one
#: sorted task) to ``percentile_approx`` (mergeable sketch, map-side
#: combinable, no per-group total order). Sized an order of magnitude
#: above every tested SF's max group (sf0.1: ~200k rows/flag) so the
#: oracle always replays the exact path where the oracle runs; the
#: 100× audit (~20M rows/group — 82 s single-task sorts in r06)
#: trips it.
_WINSOR_EXACT_MAX_GROUP = 2_000_000


def winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group aggregates: clamp ``l_extendedprice`` to
    its per-flag [p01, p99] band (discrete positional percentiles, same
    cross-engine definition as agg_quantiles) before summing — the
    standard outlier-robust statistic for long-tailed metrics.

    Scale shape: the rank window, the bound-broadcasting window
    aggregates, and the final hash-agg all partition on the SAME key,
    so Catalyst plans exactly one exchange — the bounds never round-trip
    through the driver and there is no self-join against a percentile
    table. Caveat: a rank window over a LOW-cardinality key (3 flags
    here) serializes each group into one task — exactness has that
    price, so ABOVE ``_WINSOR_EXACT_MAX_GROUP`` rows in the largest
    group the bound computation auto-switches to ``percentile_approx``
    (accuracy 10000 ⇒ rank error ≤ 0.01% of the group — the p01/p99
    estimate sits within one part in 10⁴ of the true rank) with the
    clamp/agg unchanged. The guard is a limit-probe (scans ≤
    threshold+1 rows, O(threshold) however large the table) followed
    by a group-count max only when the probe trips, so tested SFs pay
    one cheap probe job and always take the exact path the oracle
    replays."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    # limit-probe (the _BROADCAST_MAX_VECTORS guard pattern): only a
    # table that COULD hold an oversized group pays the group-count
    over = (
        li.select("l_returnflag")
        .limit(_WINSOR_EXACT_MAX_GROUP + 1)
        .count()
    )
    if over > _WINSOR_EXACT_MAX_GROUP:
        max_group = (
            li.groupBy("l_returnflag")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        if max_group > _WINSOR_EXACT_MAX_GROUP:
            return _winsorized_prices_approx(li)
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wp = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wo).alias("pos"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    bounded = ranked.select(
        "l_returnflag",
        "l_extendedprice",
        F.max(
            F.when(
                F.col("pos") == F.ceil(F.col("n") * 0.01),
                F.col("l_extendedprice"),
            )
        )
        .over(wp)
        .alias("lo"),
        F.max(
            F.when(
                F.col("pos") == F.ceil(F.col("n") * 0.99),
                F.col("l_extendedprice"),
            )
        )
        .over(wp)
        .alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return bounded.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("lo").alias("p01_price"),
        F.min("hi").alias("p99_price"),
        F.sum(dec(clamped)).cast("double").alias("winsor_sum"),
        F.round(
            F.sum(dec(clamped)).cast("double") / F.count(F.lit(1)), 6
        ).alias("winsor_avg"),
    )


def _winsorized_prices_approx(li: DataFrame) -> DataFrame:
    """Audit-scale bound path for :func:`winsorized_prices`: p01/p99
    from ``percentile_approx`` (accuracy 10000), clamp and aggregate
    expressions IDENTICAL to the exact path. Two map-side-combinable
    hash aggs + a 3-row broadcast join — no per-group total order, so
    no single-task sort whatever the group size. Only reachable above
    ``_WINSOR_EXACT_MAX_GROUP`` rows/group (never at oracle SFs)."""
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.01, 10000).alias("lo"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("hi"),
    )
    joined = li.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("lo").alias("p01_price"),
        F.min("hi").alias("p99_price"),
        F.sum(dec(clamped)).cast("double").alias("winsor_sum"),
        F.round(
            F.sum(dec(clamped)).cast("double") / F.count(F.lit(1)), 6
        ).alias("winsor_avg"),
    )


WINSORIZED_PRICES_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey,
                                     l_linenumber) AS pos,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
bounded AS (
  SELECT l_returnflag, l_extendedprice,
         MAX(CASE WHEN pos = CEIL(n * 0.01) THEN l_extendedprice END)
             OVER (PARTITION BY l_returnflag) AS lo,
         MAX(CASE WHEN pos = CEIL(n * 0.99) THEN l_extendedprice END)
             OVER (PARTITION BY l_returnflag) AS hi
  FROM ranked
)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       MIN(lo) AS p01_price,
       MIN(hi) AS p99_price,
       CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi)
                     AS DECIMAL(12,2))) AS DOUBLE) AS winsor_sum,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi)
                           AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)
           AS winsor_avg
FROM bounded
GROUP BY l_returnflag
"""


def pareto_frontier(pts: DataFrame, x: str, y: str) -> DataFrame:
    """Generic two-phase distributed 2-D skyline over DISTINCT
    ``(x, y)`` rows (maximize both): the skyline of a union is a
    subset of the union of per-partition skylines, so phase 1 computes
    each Arrow batch's local frontier with one sorted cummax sweep
    (O(p log p) per batch, never cross-partition), and phase 2
    re-sweeps only the surviving candidates — frontier-sized,
    typically O(log n) points for non-adversarial data — on one
    partition. No global sort of the base data, no pairwise join.
    (An anti-correlated worst case can make any skyline large — that
    is a property of the answer, not the algorithm.)

    Column types must sort consistently in pandas (numeric /
    datetime64); hypothesis-tested against brute-force dominance."""
    import pandas as pd

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pts.select(x, y).schema.fields
    )

    def _frontier(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([x, y], ascending=[False, False]).reset_index(
            drop=True
        )
        prior_max = pdf[y].cummax().shift(1)
        return pdf[prior_max.isna() | (pdf[y] > prior_max)]

    def sweep_batches(batches):
        # per-Arrow-batch sweep: bounded state, and the union of
        # per-batch frontiers still contains the global frontier
        for pdf in batches:
            if len(pdf):
                yield _frontier(pdf)

    def sweep_all(batches):
        # final pass must see every candidate at once — a coalesced
        # partition can still arrive as multiple Arrow batches
        frames = [b for b in batches if len(b)]
        if frames:
            yield _frontier(pd.concat(frames, ignore_index=True))

    local = pts.select(x, y).mapInPandas(sweep_batches, schema)
    return local.coalesce(1).mapInPandas(sweep_all, schema)


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of orders over (totalprice ↑,
    orderdate ↑): the points no other point beats on both axes — the
    multi-criteria shortlist operator (best price/recency trade-offs)
    relational engines express as an O(n²) NOT EXISTS anti-join.
    :func:`pareto_frontier` is the reusable two-phase kernel.

    Points are deduplicated first so strict-dominance sweeps are
    well-defined; price is cast to double (exact for DECIMAL(15,2)
    magnitudes) and dates to timestamp_ntz for the cross-engine
    comparison bridge.
    """
    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("odate"),
    ).distinct()
    return pareto_frontier(pts, "price", "odate")


SKYLINE_ORDERS_SQL = """
WITH pts AS (
  SELECT DISTINCT CAST(o_totalprice AS DOUBLE) AS price,
         CAST(o_orderdate AS TIMESTAMP) AS odate
  FROM orders
)
SELECT price, odate FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price >= p.price AND q.odate >= p.odate
    AND (q.price > p.price OR q.odate > p.odate)
)
"""


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals: 8
    buckets holding (near-)equal row counts, with each bucket's value
    range — the optimizer-statistics / data-profiling companion to the
    fixed-width `value_histogram` (skewed data collapses fixed-width
    bins; equi-depth adapts bin edges to density).

    Scale shape: `ntile` is one total-order window — a range-partition
    sort, the same cost class as a global ORDER BY, and the honest
    price of EXACT equi-depth. The approximate path at 100 TB is
    `percentile_approx` on the same column (mergeable GK sketch, no
    sort) — `agg_approx_quantiles` next door is exactly that."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            dec("o_totalprice").alias("price"),
            F.ntile(8).over(w).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("price").cast("double").alias("lo"),
            F.max("price").cast("double").alias("hi"),
        )
    )


EQUI_DEPTH_HISTOGRAM_SQL = """
SELECT bucket, COUNT(*) AS n_rows,
       CAST(MIN(price) AS DOUBLE) AS lo,
       CAST(MAX(price) AS DOUBLE) AS hi
FROM (
  SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
GROUP BY bucket
"""


def important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value, kept only where the part
    exceeds a fixed fraction of TOTAL stock value — the global
    aggregate enters as a broadcast scalar, not a self-join or a
    collected driver value.

    Scale shape: one hash-agg by part; the grand total is a 1-row
    aggregate over the SAME partial aggregates (Catalyst reuses the
    scan via exchange reuse where possible) broadcast into the filter.
    No second full scan is logically required, no driver round-trip."""
    ps = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (dec("l_extendedprice") * F.col("l_quantity").cast("decimal(12,2)"))
        .alias("val"),
    )
    per_part = ps.groupBy("l_partkey").agg(F.sum("val").alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.0005)
        .select(
            "l_partkey",
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


IMPORTANT_PART_STOCK_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part, (SELECT SUM(part_value) AS total_value FROM per_part)
WHERE part_value > total_value * 0.0005
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum 3-month
    revenue — an aggregate-of-aggregate where the max enters as a
    broadcast scalar against the per-supplier rollup (the classic
    "create view revenue AS ..." query, inlined).

    Scale shape: one shuffle (supplier hash-agg over the date-pruned
    scan — the filter reaches the parquet footer), a 1-row max
    broadcast back, decimal-exact revenue compare so ties are exact,
    not float-fuzzy."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
        ).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
             AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    RECENT orders (none on/after 2000-01-01 — "idle") — an
    uncorrelated scalar subquery (the average enters as a broadcast
    1-row aggregate) composed with an anti-join. The cutoff sits
    inside the synthetic date domain (1995-2001), so the result is
    non-empty at every SF (5/55/646 rows at sf0.001/0.01/0.1) and the
    hash discriminates; the original "no orders at all" was empty
    everywhere (r11 verdict item 4).

    Scale shape: anti-join shuffles on custkey (or broadcasts small
    order keys); the date filter pushes to the orders scan; the
    average never touches the driver; grouped by market segment."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.col("c_mktsegment").alias("segment")
    )
    # exact decimal sum / count as double — engine-native AVG(decimal)
    # rounds at different scales across engines (boundary-flip risk)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


IDLE_RICH_CUSTOMERS_SQL = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2000-01-01')
GROUP BY 1
"""


def grouped_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of quantity on discount — the grouped
    regression a pricing team runs per product family ("how much does
    a point of discount move volume for THIS brand?"), the grouped
    sibling of the global ``agg_regression``.

    Cross-engine exactness: the OLS moments (Σx, Σy, Σxy, Σx², n) are
    EXACT DECIMAL sums — discount and quantity are 2-decimal money
    columns, their products are exact decimals, and decimal addition
    is order-insensitive — so the final slope division starts from
    bit-identical inputs in both engines and ROUND 6 cannot flip
    (float moment sums would wobble with partition order).

    Scale shape: brand rides a broadcast dim join onto the fact scan;
    the moments are ONE partial+final hash-agg (5 decimal sums per
    brand); slope arithmetic is per-group projection on ~25 rows.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = dec("l_discount")
    y = dec("l_quantity")
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # degenerate group (one row, or all-equal discounts) → den = 0:
    # emit NULL slope rather than NaN/Inf (NaN compares unequal
    # cross-engine; the oracle mirrors with NULLIF)
    return m.select(
        "p_brand",
        "n",
        F.round(
            F.when(den != 0, num.cast("double") / den.cast("double")), 6
        ).alias("slope"),
        F.round(
            (F.col("sy").cast("double") / F.col("n")), 6
        ).alias("mean_qty"),
    ).orderBy("p_brand")


GROUPED_PRICE_ELASTICITY_SQL = """
WITH m AS (
  SELECT p_brand,
         COUNT(*) AS n,
         SUM(CAST(l_discount AS DECIMAL(12,2))) AS sx,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sy,
         SUM(CAST(l_discount AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS sxy,
         SUM(CAST(l_discount AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2))) AS sxx
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy AS DOUBLE) / n, 6) AS mean_qty
FROM m ORDER BY p_brand
"""


_BASKET_TOP_K = 20


def market_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top brand PAIRS bought together
    in one order — the support table an association-rule miner starts
    from (frequent-itemset mining, k=2).

    Scale shape: brands ride a broadcast dim join; each order
    collapses to its sorted DISTINCT brand set (bounded by |brands| ≈
    25, one order-keyed agg); pairs expand IN-ROW from the sorted
    array (flatten of slice-transforms — fan-out ≤ C(|brands|,2) per
    order, never a self-join of the fact table); pair counts are one
    map-side-combinable hash-agg over ≤ C(25,2) keys; top-k is
    TakeOrderedAndProject with a full lexicographic tie-break.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    arr = F.col("brands")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("brand_a"), F.col("p.b").alias("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(_BASKET_TOP_K)
    )


MARKET_BASKET_BRAND_PAIRS_SQL = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
       COUNT(*) AS n_orders
FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                 AND x.p_brand < y.p_brand
GROUP BY x.p_brand, y.p_brand
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT {_BASKET_TOP_K}
"""


SPECS: list[QuerySpec] = [
    QuerySpec("grouped_price_elasticity", grouped_price_elasticity,
              GROUPED_PRICE_ELASTICITY_SQL,
              "per-brand OLS slope from exact decimal moments",
              ("agg", "stats")),
    QuerySpec("market_basket_brand_pairs", market_basket_brand_pairs,
              MARKET_BASKET_BRAND_PAIRS_SQL,
              "top co-purchased brand pairs via in-row pair expansion",
              ("agg", "mining")),
    QuerySpec("orders_customers_full", orders_customers_full,
              ORDERS_CUSTOMERS_FULL_SQL, "full outer join", ("join",)),
    QuerySpec("equi_depth_histogram", equi_depth_histogram,
              EQUI_DEPTH_HISTOGRAM_SQL,
              "equal-frequency 8-bucket histogram via ntile",
              ("agg", "profiling")),
    QuerySpec("skyline_orders", skyline_orders, SKYLINE_ORDERS_SQL,
              "two-phase distributed Pareto frontier (price x recency)",
              ("relational", "ml")),
    QuerySpec("important_part_stock", important_part_stock,
              IMPORTANT_PART_STOCK_SQL,
              "TPC-H Q11 shape: share-of-global-aggregate filter",
              ("agg", "sql")),
    QuerySpec("top_supplier_revenue", top_supplier_revenue,
              TOP_SUPPLIER_REVENUE_SQL,
              "TPC-H Q15 shape: argmax via broadcast scalar aggregate",
              ("agg", "join", "sql")),
    QuerySpec("idle_rich_customers", idle_rich_customers,
              IDLE_RICH_CUSTOMERS_SQL,
              "TPC-H Q22 shape: scalar subquery + anti-join aggregate",
              ("join", "sql")),
    QuerySpec("orders_snapshot_diff", orders_snapshot_diff,
              ORDERS_SNAPSHOT_DIFF_SQL,
              "snapshot reconciliation: added/removed/changed diff",
              ("join", "warehouse")),
    QuerySpec("hierarchy_rollup_cte", hierarchy_rollup_cte,
              HIERARCHY_ROLLUP_CTE_SQL,
              "recursive CTE tree rollup: descendants per ancestor",
              ("sql", "iterative")),
    QuerySpec("winsorized_prices", winsorized_prices,
              WINSORIZED_PRICES_SQL,
              "outlier-robust winsorized aggregates via positional p01/p99",
              ("agg",)),
    QuerySpec("orders_right_join_customers", orders_right_join_customers,
              ORDERS_RIGHT_JOIN_CUSTOMERS_SQL, "right outer join", ("join",)),
    QuerySpec("asof_last_event", asof_last_event, ASOF_LAST_EVENT_SQL,
              "as-of join via per-key window (no pair enumeration)", ("join", "events")),
    QuerySpec("agg_grouping_sets", agg_grouping_sets, AGG_GROUPING_SETS_SQL,
              "explicit GROUPING SETS + GROUPING()", ("agg",)),
    QuerySpec("agg_collect_sets", agg_collect_sets, AGG_COLLECT_SETS_SQL,
              "collect_set array aggregation", ("agg",)),
    QuerySpec("agg_approx_distinct", agg_approx_distinct, None,
              "HLL++ approximate distinct", ("agg",)),
    QuerySpec("pivot_status_counts", pivot_status_counts, PIVOT_STATUS_COUNTS_SQL,
              "PIVOT with pinned values", ("agg",)),
    QuerySpec("explode_event_props", explode_event_props, EXPLODE_EVENT_PROPS_SQL,
              "JSON map parse + explode (generator surface)", ("scalar",)),
    QuerySpec("priciest_order_per_priority", priciest_order_per_priority,
              PRICIEST_ORDER_PER_PRIORITY_SQL,
              "correlated scalar subquery", ("join", "agg")),
    QuerySpec("window_ntile_orders", window_ntile_orders, WINDOW_NTILE_ORDERS_SQL,
              "ntile/percent_rank/cume_dist", ("window",)),
    QuerySpec("window_range_frame", window_range_frame, WINDOW_RANGE_FRAME_SQL,
              "value-based RANGE frame", ("window",)),
    QuerySpec("pricing_summary", pricing_summary, PRICING_SUMMARY_SQL,
              "TPC-H Q1-shaped scan→filter→groupBy→multi-agg", ("agg", "flagship")),
    QuerySpec("agg_distinct", agg_distinct, AGG_DISTINCT_SQL,
              "COUNT DISTINCT per group", ("agg",)),
    QuerySpec("agg_rollup", agg_rollup, AGG_ROLLUP_SQL, "ROLLUP grouping sets", ("agg",)),
    QuerySpec("agg_cube", agg_cube, AGG_CUBE_SQL, "CUBE grouping sets", ("agg",)),
    QuerySpec("agg_quantiles", agg_quantiles, AGG_QUANTILES_SQL,
              "discrete percentiles via window position", ("agg", "window")),
    QuerySpec("profile_orders", profile_orders, PROFILE_ORDERS_SQL,
              "single-pass per-column data profiling (stack unpivot)",
              ("agg", "profiling")),
    QuerySpec("agg_regression", agg_regression, AGG_REGRESSION_SQL,
              "regr_slope/intercept/r2 one-pass OLS aggregates", ("agg", "stats")),
    QuerySpec("agg_approx_quantiles", agg_approx_quantiles, None,
              "mergeable quantile sketch (percentile_approx)", ("agg", "sketch")),
    QuerySpec("top_revenue_orders", top_revenue_orders, TOP_REVENUE_ORDERS_SQL,
              "3-way join + agg + top-k (TPC-H Q3 shape)", ("join", "flagship")),
    QuerySpec("revenue_by_nation", revenue_by_nation, REVENUE_BY_NATION_SQL,
              "star join over broadcast dim chain (TPC-H Q5 shape)", ("join", "flagship")),
    QuerySpec("customer_order_stats", customer_order_stats, CUSTOMER_ORDER_STATS_SQL,
              "left outer join + coalesce", ("join",)),
    QuerySpec("customers_without_orders", customers_without_orders,
              CUSTOMERS_WITHOUT_ORDERS_SQL, "anti join (NOT EXISTS)", ("join",)),
    QuerySpec("customers_with_urgent_orders", customers_with_urgent_orders,
              CUSTOMERS_WITH_URGENT_ORDERS_SQL, "semi join (EXISTS)", ("join",)),
    QuerySpec("supplier_balance_pairs", supplier_balance_pairs,
              SUPPLIER_BALANCE_PAIRS_SQL, "theta/non-equi join", ("join",)),
    QuerySpec("region_nation_cross", region_nation_cross, REGION_NATION_CROSS_SQL,
              "cross join", ("join",)),
    QuerySpec("window_rank_orders", window_rank_orders, WINDOW_RANK_ORDERS_SQL,
              "rank/dense_rank", ("window",)),
    QuerySpec("window_lag_orders", window_lag_orders, WINDOW_LAG_ORDERS_SQL,
              "lag/lead", ("window",)),
    QuerySpec("window_running_total", window_running_total, WINDOW_RUNNING_TOTAL_SQL,
              "cumulative frame", ("window",)),
    QuerySpec("topk_orders_per_customer", topk_orders_per_customer,
              TOPK_ORDERS_PER_CUSTOMER_SQL, "per-group top-k", ("window",)),
    QuerySpec("set_union_customers", set_union_customers, SET_UNION_CUSTOMERS_SQL,
              "UNION distinct", ("setop",)),
    QuerySpec("set_intersect_customers", set_intersect_customers,
              SET_INTERSECT_CUSTOMERS_SQL, "INTERSECT", ("setop",)),
    QuerySpec("set_except_customers", set_except_customers, SET_EXCEPT_CUSTOMERS_SQL,
              "EXCEPT", ("setop",)),
    QuerySpec("set_except_all_customers", set_except_all_customers,
              SET_EXCEPT_ALL_CUSTOMERS_SQL, "EXCEPT ALL (bag)", ("setop",)),
    QuerySpec("set_intersect_all_customers", set_intersect_all_customers,
              SET_INTERSECT_ALL_CUSTOMERS_SQL, "INTERSECT ALL (bag)", ("setop",)),
    QuerySpec("orders_exists_subquery", orders_exists_subquery,
              ORDERS_EXISTS_SUBQUERY_SQL, "correlated EXISTS/NOT EXISTS",
              ("subquery",)),
    QuerySpec("lateral_top_orders", lateral_top_orders, LATERAL_TOP_ORDERS_SQL,
              "LATERAL correlated table subquery", ("subquery", "join")),
    QuerySpec("top_orders", top_orders, TOP_ORDERS_SQL,
              "global sort + limit (TakeOrderedAndProject)", ("sort",)),
    QuerySpec("scalar_string_funcs", scalar_string_funcs, SCALAR_STRING_FUNCS_SQL,
              "string function library", ("scalar",)),
    QuerySpec("scalar_date_funcs", scalar_date_funcs, SCALAR_DATE_FUNCS_SQL,
              "date function library", ("scalar",)),
    QuerySpec("scalar_conditional_funcs", scalar_conditional_funcs,
              SCALAR_CONDITIONAL_FUNCS_SQL, "CASE WHEN / NULLIF", ("scalar",)),
    QuerySpec("scalar_json_events", scalar_json_events, SCALAR_JSON_EVENTS_SQL,
              "JSON extraction", ("scalar",)),
    *SPECS_STATS,
]
