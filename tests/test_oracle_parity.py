"""Differential oracle test: every registered query with an oracle must
match DuckDB exactly at sf0.01 — the same gate the driver runs."""

from __future__ import annotations

import pytest

from data_ingestion_tool_spark.operators import registry
from tests.conftest import SF_CORRECT
from tests.parity import compare

REG = registry()
ORACLE_NAMES = sorted(n for n, s in REG.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = REG[name]
    sdf = spec.builder(spark, SF_CORRECT)
    ddf = duck.execute(spec.oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark):
    for name, spec in REG.items():
        if spec.oracle is None:
            df = spec.builder(spark, SF_CORRECT)
            assert df.count() >= 0, name


def test_approx_distinct_within_hll_error(spark):
    """HLL++ estimates land within 5% of exact distinct counts (default
    relative SD is 0.05; at these cardinalities 5% is a safe bound)."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.sources.tables import load_table

    li = load_table(spark, SF_CORRECT, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) <= 0.05 * r["exact"] + 1
