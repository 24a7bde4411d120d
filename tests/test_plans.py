"""Plan-shape assertions: the optimizer gates from SURVEY §4 — predicate
pushdown reaches the parquet scan, small dims broadcast, top-k is
TakeOrderedAndProject, expressions stay in WholeStageCodegen."""

from __future__ import annotations

import pytest

from octocode_spark.plans.explain import formatted_plan, plan_has

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    from octocode_spark.queries import queries

    return queries()


def test_q01_pushes_shipdate_filter_stays_jvm(spark, qs):
    plan = formatted_plan(qs["q01_pricing_summary"](spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
    # hot path must stay JVM-side: no row/Arrow Python eval operators
    # (AQE's pre-execution explain hides WholeStageCodegen spans, so assert
    # the absence of the slow path rather than the presence of codegen)
    assert "EvalPython" not in plan


def test_q02_broadcasts_dimensions(spark, qs):
    plan = formatted_plan(qs["q02_revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q05_topk_is_take_ordered(spark, qs):
    plan = formatted_plan(qs["q05_topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_q17_cosine_topk_is_take_ordered_single_scan(spark, qs):
    plan = formatted_plan(qs["q17_cosine_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reads_only_needed_columns(spark, qs):
    # q23 touches only (event_type, user_id): ReadSchema must not list value/props
    plan = formatted_plan(qs["q23_distinct_users_per_type"](spark, SF))
    read = plan.split("ReadSchema")[1][:300]
    assert "user_id" in read and "event_type" in read
    assert "props" not in read and "value" not in read


def test_anti_join_strategy(spark, qs):
    plan = formatted_plan(qs["q03_customers_without_orders"](spark, SF))
    assert "LeftAnti" in plan


def test_merge_prune_join_is_semi(spark, qs):
    checks = plan_has(qs["q04_big_spenders_semi"](spark, SF), "LeftSemi", "PushedFilters")
    assert all(checks.values()), checks
