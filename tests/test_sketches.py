"""KMV distinct-count sketch: exactness below k, estimation accuracy
above k, merge-equals-union semantics, and plan shape (the orderBy+limit
must compile to TakeOrderedAndProject — per-partition k-minima merged,
i.e. the distributed plan IS the sketch merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfidf_spark.operators.sketches import kmv_distinct


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v")
    )


def test_small_universe_is_exact(spark):
    row = kmv_distinct(_vals(spark, 100), "v", k=256).collect()[0]
    assert row["n_kept"] == 100
    assert row["est_distinct_r"] == 100.0


def test_duplicates_do_not_change_the_sketch(spark):
    once = kmv_distinct(_vals(spark, 100), "v", k=256).collect()[0]
    tripled = _vals(spark, 100).union(_vals(spark, 100)).union(_vals(spark, 100))
    thrice = kmv_distinct(tripled, "v", k=256).collect()[0]
    assert once == thrice


def test_estimate_within_stderr(spark):
    # k=256 -> stderr ~ 1/sqrt(254) ~ 6.3%; allow 4 sigma
    n = 20_000
    row = kmv_distinct(_vals(spark, n), "v", k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["est_distinct_r"] - n) / n < 0.25


def test_merge_equals_union(spark):
    # sketch(A union B) must equal the sketch of the concatenated inputs
    # regardless of how rows are partitioned: repartitioning cannot
    # change an order-statistic of a set
    a, b = _vals(spark, 5000, "a"), _vals(spark, 5000, "b")
    whole = kmv_distinct(a.union(b), "v", k=64).collect()[0]
    shuffled = kmv_distinct(a.union(b).repartition(16), "v", k=64).collect()[0]
    assert whole == shuffled


def test_plan_is_take_ordered(spark):
    df = kmv_distinct(_vals(spark, 1000), "v", k=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
