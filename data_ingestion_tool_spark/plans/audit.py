"""Physical-plan extraction and assertion helpers."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, returned instead of printed."""
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("formatted"))


@dataclass
class PlanReport:
    """Facts a scale review cares about, extracted from one plan."""

    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    map_in_pandas: int = 0
    window_group_limits: int = 0
    generates: int = 0
    broadcast_exchanges: int = 0
    grouped_pandas: int = 0


def plan_report(df: DataFrame) -> PlanReport:
    text = formatted_plan(df)
    rep = PlanReport()
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            rep.pushed_filters.append(s.removeprefix("PushedFilters:").strip())
        elif s.startswith("ReadSchema:"):
            rep.read_schemas.append(s.removeprefix("ReadSchema:").strip())
    # formatted mode prints every node twice (tree + numbered detail);
    # count the "(n) Name" detail entries so each node counts once.
    # BroadcastExchange prints as its own node name (the cheap kind) so
    # the Exchange pattern counts shuffle exchanges only.
    def nodes(name: str) -> int:
        return len(re.findall(rf"\(\d+\) {name}\b", text))

    rep.broadcast_hash_joins = nodes("BroadcastHashJoin")
    rep.sort_merge_joins = nodes("SortMergeJoin")
    rep.nested_loop_joins = nodes("BroadcastNestedLoopJoin") + nodes(
        "CartesianProduct"
    )
    rep.exchanges = nodes("Exchange")
    rep.map_in_pandas = nodes("MapInPandas")
    rep.window_group_limits = nodes("WindowGroupLimit")
    rep.generates = nodes("Generate")
    rep.broadcast_exchanges = nodes("BroadcastExchange")
    rep.grouped_pandas = nodes("FlatMapGroupsInPandas")
    return rep


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Fail unless some scan's PushedFilters mentions ``fragment``."""
    rep = plan_report(df)
    if not any(fragment in pf for pf in rep.pushed_filters):
        raise AssertionError(
            f"no pushed filter matching {fragment!r}; "
            f"pushed: {rep.pushed_filters}"
        )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    rep = plan_report(df)
    if rep.broadcast_hash_joins < at_least:
        raise AssertionError(
            f"expected ≥{at_least} BroadcastHashJoin, "
            f"found {rep.broadcast_hash_joins}"
        )
