"""The ingestion-validation engine as a registry query: the
reference's core hand-rolled operator (box_ingest.py:85-122), measured
and oracle-checked like every other operator.

The reference validates with a CPython ``iterrows()`` loop on one
driver core (~10⁴-10⁵ rows/s analytic bound, BASELINE.md). Here the
same metadata contract compiles to try_cast/when Column expressions —
whole-stage codegen over all partitions — so the bench entry directly
substantiates the throughput claim at sf0.1 (600k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table
from data_ingestion_tool_spark.validate import validate_and_split

#: metadata contract exercised against stringified lineitem columns —
#: int truncation, float laxity, stringify-never-fails, non-nullable.
_METADATA = {
    "L_Orderkey": "int",
    "l_quantity": "float",
    "L_EXTENDEDPRICE": "float",
    "l_returnflag": "string",
    "non_nullable_fields": ["l_orderkey"],
}


def validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringify a 4-column slice of lineitem (simulating a parsed
    text file), run the compiled validation, return the valid side.

    Clean input ⇒ the oracle is the equivalent cast pipeline; the
    dirty-input branches are pinned by the golden tests
    (tests/test_validate.py, FIXTURES.md A1).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("L_Orderkey "),
        F.col("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_extendedprice").cast("string").alias("L_EXTENDEDPRICE"),
        F.col("l_returnflag").alias("l_returnflag"),
    )
    valid, _invalid = validate_and_split(li, _METADATA)
    return valid


VALIDATE_LINEITEM_SQL = """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
       CAST(l_returnflag AS VARCHAR) AS l_returnflag
FROM lineitem
"""


def dq_orphan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orders whose customer key resolves
    to no customer row — the foreign-key check a warehouse runs after
    every load (the reference has no cross-row checks at all; its
    validation is per-cell, box_ingest.py:88-121).

    Scale shape: LEFT ANTI join — the parent side is dim-sized and
    broadcasts; violations (normally ~0 rows) aggregate to one row per
    offending key. Never a row-multiplying join."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


DQ_ORPHAN_ORDERS_SQL = """
SELECT o_custkey, COUNT(*) AS n_orphans
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
GROUP BY o_custkey
"""


def dq_duplicate_linenumbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: (orderkey, linenumber) pairs that
    appear more than once. One combinable hash-agg + HAVING — the
    shuffle carries one row per key, violations usually zero.

    An empty result IS the passing state; the driver compare treats
    0 == 0 rows as a hash match, so the audit is still externally
    verified."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


DQ_DUPLICATE_LINENUMBERS_SQL = """
SELECT l_orderkey, l_linenumber, COUNT(*) AS n_rows
FROM lineitem
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""


def dq_value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain audit: per-column out-of-bounds counts for the business
    rules the testdata schema implies (quantities in [1,50], discounts
    in [0,0.1], non-negative prices) — ONE aggregate scan produces the
    whole scorecard (conditional sums, map-side combinable), never one
    job per rule."""
    li = load_table(spark, sf_dir, "lineitem")
    bad = [
        ("quantity_range", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ("discount_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ("price_nonneg", F.col("l_extendedprice") < 0),
        ("tax_nonneg", F.col("l_tax") < 0),
    ]
    row = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in bad
        ],
    )
    return row.unpivot(
        ["n_rows"], [name for name, _ in bad], "rule", "n_violations"
    ).select("rule", "n_violations", "n_rows")


DQ_VALUE_BOUNDS_SQL = """
WITH scorecard AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
             AS quantity_range,
         SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
             AS discount_range,
         SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS price_nonneg,
         SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS tax_nonneg
  FROM lineitem
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_rows FROM (
  SELECT 'quantity_range' AS rule, quantity_range AS n_violations, n_rows FROM scorecard
  UNION ALL
  SELECT 'discount_range', discount_range, n_rows FROM scorecard
  UNION ALL
  SELECT 'price_nonneg', price_nonneg, n_rows FROM scorecard
  UNION ALL
  SELECT 'tax_nonneg', tax_nonneg, n_rows FROM scorecard
)
"""


_PSI_BIN_WIDTH = 20000
_PSI_CUTOVER = "1998-01-01"


def dq_price_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: Population Stability Index of the order
    price distribution, base period vs current (cutover {c}) — the
    standard ML-ops drift score (PSI < 0.1 stable, > 0.25 retrain).

    Scale shape: ONE conditional hash-aggregate builds both periods'
    histograms simultaneously (never two scans); totals ride a 1-row
    broadcast; additive-0.5 smoothing keeps empty bins defined. The
    whole scorecard is a |bins|-row intermediate regardless of table
    size."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderdate") < _PSI_CUTOVER, 1).otherwise(0).alias("is_base"),
        F.floor(F.col("o_totalprice") / _PSI_BIN_WIDTH).cast("long").alias("bin"),
    )
    bins = o.groupBy("bin").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(1 - F.col("is_base")).alias("n_cur"),
    )
    tot = bins.agg(
        F.sum("n_base").alias("tot_base"),
        F.sum("n_cur").alias("tot_cur"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_base") + 0.5) / (F.col("tot_base") + 0.5 * F.col("k"))
    q = (F.col("n_cur") + 0.5) / (F.col("tot_cur") + 0.5 * F.col("k"))
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(((p - q) * F.log(p / q)).alias("contrib"), "k")
        .groupBy("k")
        .agg(F.round(F.sum("contrib"), 6).alias("psi"))
        .select(F.col("k").alias("n_bins"), "psi")
    )


dq_price_drift_psi.__doc__ = dq_price_drift_psi.__doc__.format(c=_PSI_CUTOVER)


DQ_PRICE_DRIFT_PSI_SQL = f"""
WITH bins AS (
  SELECT CAST(FLOOR(o_totalprice / {_PSI_BIN_WIDTH}) AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN o_orderdate < DATE '{_PSI_CUTOVER}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN o_orderdate < DATE '{_PSI_CUTOVER}'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_base) AS BIGINT) AS tot_base,
         CAST(SUM(n_cur) AS BIGINT) AS tot_cur,
         COUNT(*) AS k
  FROM bins
)
SELECT k AS n_bins,
       ROUND(SUM(((n_base + 0.5) / (tot_base + 0.5 * k)
                  - (n_cur + 0.5) / (tot_cur + 0.5 * k))
                 * LN(((n_base + 0.5) / (tot_base + 0.5 * k))
                      / ((n_cur + 0.5) / (tot_cur + 0.5 * k)))), 6) AS psi
FROM bins, tot
GROUP BY k
"""


SPECS: list[QuerySpec] = [
    QuerySpec("dq_price_drift_psi", dq_price_drift_psi, DQ_PRICE_DRIFT_PSI_SQL,
              "PSI drift score: one-scan dual-period histogram",
              ("ingest", "dq", "ml")),
    QuerySpec("validate_lineitem", validate_lineitem, VALIDATE_LINEITEM_SQL,
              "metadata-compiled validation (the reference's row loop, "
              "vectorized)", ("ingest", "flagship")),
    QuerySpec("dq_orphan_orders", dq_orphan_orders, DQ_ORPHAN_ORDERS_SQL,
              "FK audit: anti-join orphan detection", ("ingest", "dq")),
    QuerySpec("dq_duplicate_linenumbers", dq_duplicate_linenumbers,
              DQ_DUPLICATE_LINENUMBERS_SQL,
              "PK uniqueness audit via HAVING hash-agg", ("ingest", "dq")),
    QuerySpec("dq_value_bounds", dq_value_bounds, DQ_VALUE_BOUNDS_SQL,
              "one-scan domain-rule scorecard (conditional sums)",
              ("ingest", "dq")),
]
