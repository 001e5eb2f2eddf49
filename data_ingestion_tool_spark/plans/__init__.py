"""Plan-inspection utilities: programmatic access to the physical plan
for tests and plan audits (PLANS.md is generated from these).

The 100 TB design contract is checkable: filters reach scans
(``PushedFilters``), projections prune (``ReadSchema``), dim joins
broadcast, and Python appears only in declared ``MapInPandas`` stages.
``plan_report`` extracts those facts so tests can assert them instead
of eyeballing ``.explain`` output.
"""

from data_ingestion_tool_spark.plans.audit import (
    assert_broadcast_join,
    assert_pushed_filter,
    formatted_plan,
    plan_report,
)

__all__ = [
    "assert_broadcast_join",
    "assert_pushed_filter",
    "formatted_plan",
    "plan_report",
]
