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
