"""Row-level security policy join + column masking (SURVEY.md §2.2 P3:
the reference's controller-level ownership 403 re-expressed as a
data-plane operator)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfidf_spark.operators.security import apply_row_policy, mask_columns

FACTS = [
    (1, "teamA", "alpha secret"),
    (2, "teamA", "beta secret"),
    (3, "teamB", "gamma secret"),
    (4, "teamC", "delta secret"),
]
GRANTS = [
    ("alice", "teamA"),
    ("alice", "teamC"),
    ("bob", "teamB"),
]


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(FACTS, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def grants(spark):
    return spark.createDataFrame(GRANTS, "principal string, scope string")


def test_policy_filters_to_granted_scopes(facts, grants):
    alice = apply_row_policy(facts, grants, "alice", "source")
    assert {r["doc_id"] for r in alice.collect()} == {1, 2, 4}
    bob = apply_row_policy(facts, grants, "bob", "source")
    assert {r["doc_id"] for r in bob.collect()} == {3}


def test_unknown_principal_sees_nothing(facts, grants):
    assert apply_row_policy(facts, grants, "mallory", "source").count() == 0


def test_policy_is_broadcast_semi_join(facts, grants):
    plan = (
        apply_row_policy(facts, grants, "alice", "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the fact side is never shuffled by the policy
    assert "Exchange hashpartitioning" not in plan


def test_policy_composes_under_queries(facts, grants):
    alice = apply_row_policy(facts, grants, "alice", "source")
    agg = {r["source"]: r["n"] for r in
           alice.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert agg == {"teamA": 2, "teamC": 1}


def test_mask_columns(facts):
    masked = mask_columns(
        facts, {"text": F.sha2(F.col("text"), 256), "source": None}
    )
    assert "source" not in masked.columns
    row = masked.filter(F.col("doc_id") == 1).collect()[0]
    assert len(row["text"]) == 64 and "secret" not in row["text"]
