"""Physical-plan regression tests: the scale properties we rely on —
broadcast vs sort-merge choice, filter pushdown, column pruning — must
survive refactors, not just row-count checks."""

from __future__ import annotations

import re

import pytest

from outreach_etl_tool_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_broadcasts_dims(spark):
    plan = plan_of(spark, "funnel")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact


def test_fact_fact_uses_sort_merge(spark):
    plan = plan_of(spark, "join_fact_fact")
    assert "SortMergeJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "filter_ts_range")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("GreaterThan" in p or "LessThan" in p or "o_orderdate" in p
               for p in pushed), plan


def test_column_pruning_funnel(spark):
    plan = plan_of(spark, "funnel")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    # the orders scan must not read the full table width
    orders_scan = next(s for s in schemas if "o_custkey" in s)
    assert "o_orderdate" not in orders_scan
    assert "o_orderpriority" not in orders_scan


def test_top_k_is_take_ordered(spark):
    plan = plan_of(spark, "top_k_orders")
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_text_stats_stays_jvm_side(spark):
    plan = plan_of(spark, "text_stats")
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan  # pure expression pipeline


def test_semi_anti_join_shapes(spark):
    for name, kind in (("join_semi", "LeftSemi"), ("join_anti", "LeftAnti")):
        plan = plan_of(spark, name)
        assert kind in plan, f"{name}: {plan[:500]}"


@pytest.mark.parametrize("name", ["pricing_summary", "agg_engagement_counters"])
def test_aggs_have_partial_phase(spark, name):
    # map-side partial aggregation must precede the exchange
    plan = plan_of(spark, name)
    assert plan.count("HashAggregate") >= 2 or "partial" in plan.lower(), plan[:800]
