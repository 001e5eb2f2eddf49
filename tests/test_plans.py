"""Plan-contract tests: the scale-design claims (pushdown, broadcast,
single-shuffle shapes, Python only at declared edges) asserted
programmatically, not eyeballed."""

from __future__ import annotations

from data_ingestion_tool_spark.operators import registry
from data_ingestion_tool_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filter,
    plan_report,
)
from tests.conftest import SF_CORRECT

REG = registry()


def test_pricing_summary_pushes_filter_and_prunes(spark):
    df = REG["pricing_summary"].builder(spark, SF_CORRECT)
    assert_pushed_filter(df, "l_shipdate")
    rep = plan_report(df)
    # 7 needed columns, not all 16
    assert rep.read_schemas and "l_orderkey" not in rep.read_schemas[0]
    assert rep.exchanges == 1  # one agg shuffle, nothing else


def test_star_join_broadcasts_every_dim(spark):
    df = REG["revenue_by_nation"].builder(spark, SF_CORRECT)
    assert_broadcast_join(df, at_least=4)
    rep = plan_report(df)
    assert rep.sort_merge_joins == 0
    assert rep.exchanges == 1  # only the final agg shuffles


def test_asof_join_is_single_shuffle_window(spark):
    df = REG["asof_last_event"].builder(spark, SF_CORRECT)
    rep = plan_report(df)
    assert rep.exchanges == 1  # shuffle on user_id only
    assert rep.nested_loop_joins == 0  # no pair enumeration


def test_topk_uses_partial_group_limit(spark):
    df = REG["topk_orders_per_customer"].builder(spark, SF_CORRECT)
    rep = plan_report(df)
    # rank pruning happens BEFORE the shuffle too (partial + final)
    assert rep.window_group_limits >= 2


def test_python_only_at_declared_edges(spark):
    """Relational flagships never fall back to Python stages."""
    for name in ("pricing_summary", "revenue_by_nation", "training_data_pipeline"):
        rep = plan_report(REG[name].builder(spark, SF_CORRECT))
        assert rep.map_in_pandas == 0, name
    # the vector kernel IS a declared Python edge
    rep = plan_report(REG["embedding_near_dup"].builder(spark, SF_CORRECT))
    assert rep.map_in_pandas == 1
