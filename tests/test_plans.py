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


def test_minhash_signatures_zero_shuffle(spark):
    """MinHash signatures (r8: one narrow kernel from the docs) must
    stay shuffle-free: no Exchange, one MapInPandas, no second UDF
    subtree."""
    plan = _plan(spark, "minhash_signature")
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
    assert plan.count("ArrowEvalPython") == 0


def test_minhash_operator_form_hashes_each_shingle_once(spark):
    """Hash-once contract of the OPERATOR pipeline (still used by
    shingle-table callers): the md5 transform over the shingle array
    must appear ONCE in the plan, with the 8 seed permutations as
    integer xors over the shared array — CollapseProject must not
    inline the non-cheap hs projection into every seed expression (that
    would put 8 md5 passes back on every shingle)."""
    from tfidf_spark.operators.dedup import doc_shingle_arrays, minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = minhash_signatures(doc_shingle_arrays(docs, n=3, text_col="text"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("md5") == 1
    assert plan.count("array_min") == 8


def test_simhash_zero_shuffle(spark):
    """SimHash from raw docs (r8, dedup.simhash_docs) = ZERO shuffle:
    tokenize + count + md5 + bit-sum all in one narrow Arrow kernel —
    never the 60x bit-row explode, no exchange at all."""
    plan = _plan(spark, "simhash")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    assert "Generate explode" not in plan
    assert "HashAggregate" not in plan


def test_simhash_postings_form_single_shuffle(spark):
    """The postings-input operator (dedup.simhash) keeps its contract:
    exactly ONE shuffle of the raw posting rows into the vectorized
    kernel — the form incremental pipelines use when postings already
    exist."""
    from tfidf_spark.operators import dedup
    from tfidf_spark.operators.postings import build_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = dedup.simhash(
        build_postings(docs, text_col="text").select("doc_id", "term", "cnt")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(doc_id") == 1
    post_shuffle = plan.split("Exchange hashpartitioning(doc_id")[0]
    assert "MapInPandas" in post_shuffle
    assert "Generate explode" not in post_shuffle
    assert "HashAggregate" not in post_shuffle


def test_lsh_single_signature_pass_two_exchanges(spark):
    """r8 LSH pair generation: ONE signature subtree (a single narrow
    MapInPandas kernel — the r7 self-join re-ran the shingle UDF on both
    sides), one (band, bucket) exchange for the bucket groupBy, one
    (a, b) exchange for the band count — no window, no join."""
    plan = _plan(spark, "minhash_lsh_pairs")
    assert plan.count("MapInPandas") == 1
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("Exchange hashpartitioning(band") == 1
    assert "Window" not in plan
    assert "Join" not in plan
