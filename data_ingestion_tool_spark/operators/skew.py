"""Skew-resilient join strategies.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only kicks in for sort-merge joins after shuffle-size
statistics exist. ``salted_join`` is the explicit pre-plan fallback for
the pathological case — a handful of keys owning a double-digit share
of a 100 TB fact table — where you want the fan-out decided before the
shuffle, not discovered during it.

Mechanics: the large (skewed) side gets a deterministic salt in
[0, salt); the small side is replicated ``salt`` times (explode of a
sequence — a row-count multiplication, so keep the small side small or
the salt modest); the join key becomes (key, salt), spreading each hot
key over ``salt`` shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_spark.functions import dec, dec_sum
from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table

_SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    sub-keys. Semantically identical to ``big.join(small, on, how)``
    for inner/left joins (each big row matches exactly one replica).

    The salt is a deterministic function of row position (partition id
    + in-partition offset via ``monotonically_increasing_id``) — NOT
    random — so retries/speculative tasks produce identical output,
    while a hot key's rows still fan out within each input partition.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replicated-right)")
    spread = F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    big_salted = big.withColumn(_SALT_COL, spread)
    small_replicated = small.withColumn(
        _SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_salted.join(small_replicated, [*on, _SALT_COL], how).drop(
        _SALT_COL
    )


def salted_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem through the salted path, aggregated — the
    oracle (a plain SQL join) proves salting is semantics-preserving.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))).alias("rev")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, ["l_orderkey"], salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SALTED_REVENUE_BY_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiling: the diagnostic you run BEFORE picking a
    join strategy at 100 TB — per-key row counts for the heaviest keys
    of a prospective shuffle key, with each key's share of the table
    and its ratio to the mean key load. A skew_ratio in the hundreds
    says "salt this key or let AQE split it"; ~1 says a plain shuffle
    is fine.

    Scale shape: one partial+final hash-agg on the key (map-side
    combine collapses hot keys early — the profile itself cannot skew),
    a broadcast 1-row global aggregate for total/mean, and a top-k
    TakeOrderedAndProject — no full sort, no second scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "l_suppkey",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("total_rows"), 6
            ).alias("key_frac"),
            F.round(
                F.col("n_rows").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total_rows"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), "l_suppkey")
        .limit(20)
    )


JOIN_KEY_SKEW_PROFILE_SQL = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
),
totals AS (
  SELECT SUM(n_rows) AS total_rows, COUNT(*) AS n_keys FROM counts
)
SELECT l_suppkey, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / total_rows, 6) AS key_frac,
       ROUND(CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE) / total_rows, 6)
           AS skew_ratio
FROM counts, totals
ORDER BY n_rows DESC, l_suppkey
LIMIT 20
"""


def self_join_blowup_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact self-join output cardinality WITHOUT executing the join:
    |T ⋈_k T| = Σ_k n(k)² — the "can I afford this pair enumeration"
    check you run before any similarity/dedup self-join at 100 TB (and
    the quantitative justification for this repo's posting-list caps:
    the answer scales with the square of the hottest key).

    Scale shape: one map-side-combinable per-key count (the profile
    cannot itself skew), then a 1-row aggregate of n² moments — the
    join never runs, the count table is |keys|-sized, and the result
    is a single row of exact integers."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.sum(F.col("n") * F.col("n")).alias("total_pairs"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max(F.col("n") * F.col("n")).alias("max_key_pairs"),
        F.round(
            F.max(F.col("n") * F.col("n")).cast("double")
            / F.sum(F.col("n") * F.col("n")),
            6,
        ).alias("hottest_key_share"),
    )


SELF_JOIN_BLOWUP_ESTIMATE_SQL = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(n * n) AS BIGINT) AS total_pairs,
       COUNT(*) AS n_keys,
       CAST(MAX(n * n) AS BIGINT) AS max_key_pairs,
       ROUND(CAST(MAX(n * n) AS DOUBLE) / SUM(n * n), 6)
         AS hottest_key_share
FROM counts
"""


SPECS: list[QuerySpec] = [
    QuerySpec("self_join_blowup_estimate", self_join_blowup_estimate,
              SELF_JOIN_BLOWUP_ESTIMATE_SQL,
              "exact self-join cardinality without running the join",
              ("skew", "profiling")),
    QuerySpec("salted_revenue_by_priority", salted_revenue_by_priority,
              SALTED_REVENUE_BY_PRIORITY_SQL,
              "hot-key-salted fact-dim join, oracle-proven equivalent",
              ("join", "skew")),
    QuerySpec("join_key_skew_profile", join_key_skew_profile,
              JOIN_KEY_SKEW_PROFILE_SQL,
              "per-key load profile: heaviest join keys + skew ratios",
              ("skew", "profiling")),
]
