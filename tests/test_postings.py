"""Postings / doc-stats / term-DF golden tests on the tiny corpus
(hand-computed per the reference semantics, SURVEY.md §7.1)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tfidf_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_stats,
    term_df,
    with_tf,
)


def test_postings_golden(tiny_corpus):
    rows = {
        (r["doc_id"], r["term"]): (r["cnt"], r["dl"])
        for r in build_postings(tiny_corpus).collect()
    }
    assert rows == {
        (1, "a"): (2, 4),
        (1, "b"): (1, 4),
        (1, "c"): (1, 4),
        (2, "a"): (1, 3),
        (2, "b"): (2, 3),
        (3, "c"): (1, 1),
    }


def test_doc_stats_includes_empty_docs(tiny_corpus):
    stats = {r["doc_id"]: (r["dl"], r["n_unique"]) for r in doc_stats(tiny_corpus).collect()}
    assert stats[1] == (4, 3)
    assert stats[4] == (0, 0)   # empty string
    assert stats[5] == (0, 0)   # snake_case-only: zero tokens
    assert stats[6] == (0, 0)   # non-ASCII-only: zero tokens
    assert len(stats) == 6


def test_term_df_golden(tiny_corpus):
    dfs = {r["term"]: r["df"] for r in term_df(build_postings(tiny_corpus)).collect()}
    assert dfs == {"a": 2, "b": 2, "c": 2}


def test_corpus_stats_counts_all_docs(tiny_corpus):
    row = corpus_stats(doc_stats(tiny_corpus)).collect()[0]
    assert row["n_docs"] == 6          # zero-token docs count toward N
    assert row["avgdl"] == pytest.approx((4 + 3 + 1 + 0 + 0 + 0) / 6)


def test_tf_reference_formula(tiny_corpus):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in with_tf(build_postings(tiny_corpus)).collect()
    }
    assert tf[(1, "a")] == pytest.approx(2 / 4)
    assert tf[(2, "b")] == pytest.approx(2 / 3)
    assert tf[(3, "c")] == pytest.approx(1.0)


def test_no_groupby_in_postings_plan(tiny_corpus):
    """Postings build must be shuffle-free (map-side counting in the UDF)."""
    plan = build_postings(tiny_corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tokenizer_evaluated_once_in_plan(tiny_corpus):
    """Regression: InferFiltersFromGenerate used to duplicate the Arrow
    tokenize UDF below the explode (2x tokenization per doc). The session
    factory excludes that rule; the plan must contain exactly one
    ArrowEvalPython node."""
    plan = build_postings(tiny_corpus)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
