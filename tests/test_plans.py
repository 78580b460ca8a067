"""Physical-plan shape regressions — the scale claims, checked as plans
(SURVEY.md §4): pushed filters reach the scan, small dims broadcast,
top-k never materializes a global sort."""

from __future__ import annotations

import pytest

from tfidf_spark import entrypoints

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        entrypoints.QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,45.0)" in plan


def test_column_pruning(spark):
    plan = _plan(spark, "scan_filter_project")
    # only the 4 projected + filtered columns are read, not all 11
    assert "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_revenue_join_broadcasts_dim(spark):
    assert "BroadcastHashJoin" in _plan(spark, "revenue_topk")


def test_semi_and_anti_joins(spark):
    assert "LeftSemi" in _plan(spark, "customers_with_orders")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_topk_has_no_global_sort(spark):
    plan = _plan(spark, "bm25_topk")
    assert "TakeOrderedAndProject" in plan
    # no standalone global Sort node feeding an exchange
    assert "Sort [score_r" not in plan


def test_bm25_query_side_broadcasts(spark):
    plan = _plan(spark, "bm25_topk")
    assert "BroadcastHashJoin" in plan
