"""As-of join and bucketized range join: hand-computable goldens
(boundaries, ties, no-match rows) plus plan-shape assertions — the whole
point of both operators is avoiding the nested-loop theta join, so the
absence of BroadcastNestedLoopJoin IS the spec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfidf_spark.operators.relational import asof_join, range_join_buckets

# key 1: orders at t=10, t=20 (two ties at 20: tb 7 and 9), t=50
# key 2: one order at t=100
RIGHT = [
    (1, 10, 7, 100.0),
    (1, 20, 7, 200.0),
    (1, 20, 9, 250.0),   # tie on ts -> tb=9 wins
    (1, 50, 3, 300.0),
    (2, 100, 1, 400.0),
]
# (key, ts, expected tb of the as-of match; None = no match)
LEFT = [
    (101, 1, 5, None),     # before any right row
    (102, 1, 10, 7),       # inclusive: equal timestamp matches
    (103, 1, 20, 9),       # tie on right ts -> max tie-break
    (104, 1, 49, 9),       # strictly between
    (105, 1, 500, 3),      # after the last
    (106, 2, 100, 1),
    (107, 3, 10, None),    # key with no right rows at all
]


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [(e, k, t) for e, k, t, _ in LEFT], "event_id long, k long, t long"
    )
    right = spark.createDataFrame(RIGHT, "k long, rt long, tb long, amount double")
    return asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        right_payload=["tb", "amount"], tie_break="tb",
    )


def test_asof_matches(joined):
    got = {r["event_id"]: r["asof_tb"] for r in joined.collect()}
    assert got == {e: exp for e, _, _, exp in LEFT}


def test_asof_payload_rides_along(joined):
    amounts = {r["event_id"]: r["asof_amount"] for r in joined.collect()}
    assert amounts[103] == 250.0 and amounts[105] == 300.0 and amounts[101] is None


def test_asof_plan_no_nested_loop(joined):
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every row crosses exactly ONE shuffle boundary into the window:
    # either a single exchange above the union, or (as Catalyst prefers)
    # one pushed into each union branch — never a join's second shuffle
    assert 1 <= plan.count("Exchange hashpartitioning(_k") <= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# intervals: [0,10) id 1; [10,20) id 2; [5,25) id 3 (spans 3 buckets at
# width 10); [30,31) id 4 (within one bucket)
INTERVALS = [(1, 0, 10), (2, 10, 20), (3, 5, 25), (4, 30, 31)]
POINTS = [(100, 0), (101, 5), (102, 9), (103, 10), (104, 24), (105, 25), (106, 30), (107, 31)]
EXPECTED = {
    (100, 1), (101, 1), (101, 3), (102, 1), (102, 3),
    (103, 2), (103, 3), (104, 3), (106, 4),
    # 105 at hi=25 of interval 3: exclusive -> no match; 107 at 31: no match
}


@pytest.fixture(scope="module")
def rjoined(spark):
    pts = spark.createDataFrame(POINTS, "pid long, p long")
    ivs = spark.createDataFrame(INTERVALS, "iid long, lo long, hi long")
    return range_join_buckets(pts, ivs, "p", "lo", "hi", bucket_width=10)


def test_range_join_pairs(rjoined):
    got = {(r["pid"], r["iid"]) for r in rjoined.collect()}
    assert got == EXPECTED


def test_range_join_no_duplicate_pairs(rjoined):
    n = rjoined.count()
    assert n == rjoined.select("pid", "iid").distinct().count() == len(EXPECTED)


def test_range_join_plan_is_equi(rjoined):
    plan = rjoined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_with_equi_keys(spark):
    pts = spark.createDataFrame(
        [(1, 10, 5), (2, 20, 5)], "pid long, p long, grp long"
    )
    ivs = spark.createDataFrame(
        [(9, 0, 100, 5), (8, 0, 100, 6)], "iid long, lo long, hi long, grp long"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_buckets(
            pts, ivs, "p", "lo", "hi", bucket_width=10, equi_keys=["grp"]
        ).collect()
    }
    assert got == {(1, 9), (2, 9)}  # grp must match too


def test_range_join_fractional_coordinates(spark):
    """Bucketing must be exact for non-integer domains too: the last
    bucket is ceil(hi/w)-1, not floor((hi-1)/w) (which drops a point at
    10.4 inside [0, 10.5) at width 5)."""
    pts = spark.createDataFrame(
        [(1, 10.4), (2, 10.5), (3, 0.0), (4, -5.01)], "pid long, p double"
    )
    ivs = spark.createDataFrame(
        [(7, 0.0, 10.5), (8, -10.0, -5.0), (9, 10.2, 10.45)],
        "iid long, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_buckets(pts, ivs, "p", "lo", "hi", bucket_width=5).collect()
    }
    assert got == {(1, 7), (3, 7), (4, 8), (1, 9)}
