"""TF-IDF / BM25 scoring golden tests, hand-computed with the reference
formulas (SURVEY.md §7.1; reference repositories/document.py:257-317)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tfidf_spark import BM25_B, BM25_K1
from tfidf_spark.operators.postings import build_postings, doc_stats, term_df, with_tf
from tfidf_spark.operators.scoring import (
    bm25_topk,
    collection_statistics,
    score_tfidf,
    tfidf_topk_per_doc,
)

N_DOCS = 6  # all docs in scope, incl. zero-token ones


@pytest.fixture(scope="module")
def scored(tiny_corpus):
    postings = with_tf(build_postings(tiny_corpus))
    return score_tfidf(postings, term_df(postings), N_DOCS)


def test_tfidf_golden(scored):
    rows = {(r["doc_id"], r["term"]): r for r in scored.collect()}
    # idf(a) = ln(6/2) for every present term (all have df=2)
    idf = math.log(6 / 2)
    r = rows[(1, "a")]
    assert r["frequency"] == 2
    assert r["tf"] == pytest.approx(0.5)
    assert r["df"] == 2
    assert r["idf"] == pytest.approx(idf)
    assert r["tfidf"] == pytest.approx(0.5 * idf)
    assert rows[(3, "c")]["tfidf"] == pytest.approx(1.0 * idf)


def test_topk_per_doc_tiebreak(scored):
    top = tfidf_topk_per_doc(scored, k=2)
    d1 = [r["term"] for r in top.filter(F.col("doc_id") == 1).collect()]
    # doc1: a has tfidf 0.5*idf; b and c tie at 0.25*idf -> term asc picks b
    assert d1 == ["a", "b"]


def test_bm25_topk_golden(tiny_corpus):
    postings = build_postings(tiny_corpus)
    tdf = term_df(postings)
    stats = doc_stats(tiny_corpus)
    avgdl = (4 + 3 + 1) / 6
    got = bm25_topk(postings, tdf, N_DOCS, avgdl, ["a", "c"], k=10).collect()

    # hand oracle
    counts = {(1, "a"): 2, (1, "b"): 1, (1, "c"): 1, (2, "a"): 1, (2, "b"): 2, (3, "c"): 1}
    dls = {1: 4, 2: 3, 3: 1}
    dfs = {"a": 2, "b": 2, "c": 2}
    k1, b = BM25_K1, BM25_B

    def w(cnt, dl):
        return cnt * (k1 + 1) / (cnt + k1 * (1 - b + b * dl / avgdl))

    expect = {}
    for term in ["a", "c"]:
        idf = math.log(N_DOCS / dfs.get(term, 1))
        for (d, t), cnt in counts.items():
            if t == term:
                expect[d] = expect.get(d, 0.0) + idf * w(cnt, dls[d])
    expect_ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))

    assert [r["doc_id"] for r in got] == [d for d, _ in expect_ranked]
    for r, (_, s) in zip(got, expect_ranked):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_bm25_duplicate_query_term_counts_twice(tiny_corpus):
    postings = build_postings(tiny_corpus)
    tdf = term_df(postings)
    avgdl = 8 / 6
    once = {r["doc_id"]: r["score"] for r in bm25_topk(postings, tdf, N_DOCS, avgdl, ["a"], k=10).collect()}
    twice = {r["doc_id"]: r["score"] for r in bm25_topk(postings, tdf, N_DOCS, avgdl, ["a", "a"], k=10).collect()}
    for d in once:
        assert twice[d] == pytest.approx(2 * once[d], rel=1e-12)


def test_bm25_absent_term_gets_df_default_1(tiny_corpus):
    """Query term absent from corpus: df defaults to 1 (idf = ln N), but it
    matches no postings so scores are unaffected; with no matching docs at
    all the result is empty."""
    postings = build_postings(tiny_corpus)
    tdf = term_df(postings)
    got = bm25_topk(postings, tdf, N_DOCS, 8 / 6, ["zzz"], k=10).collect()
    assert got == []


def test_bm25_empty_query(tiny_corpus):
    postings = build_postings(tiny_corpus)
    got = bm25_topk(postings, term_df(postings), N_DOCS, 8 / 6, [], k=5).collect()
    assert got == []


def test_collection_statistics_golden(spark, tiny_corpus):
    """Scope = whole tiny corpus as one collection 'all'."""
    postings = build_postings(tiny_corpus).withColumn("scope", F.lit("all"))
    n_per_scope = spark.createDataFrame([("all", N_DOCS)], "scope string, n_docs bigint")
    rows = {r["term"]: r for r in collection_statistics(postings, "scope", n_per_scope, k=50).collect()}
    # combined counts: a:3 b:3 c:2, total=8; df: a2 b2 c2; N=6
    total = 8
    idf = math.log(6 / 2)
    for term, comb in [("a", 3), ("b", 3), ("c", 2)]:
        r = rows[term]
        assert r["frequency"] == comb
        assert r["tf"] == pytest.approx(round(comb / total, 4), abs=1e-12)
        assert r["idf"] == pytest.approx(round(idf, 4), abs=1e-12)
        assert r["tfidf"] == pytest.approx(round(comb / total * idf, 4), abs=1e-12)


def test_collection_scoped_tfidf_mn_membership(spark, tiny_corpus):
    """True M:N scoping: doc 1 belongs to BOTH collections; df/N are
    per-collection, so the same (doc, term) scores differently in each.

    coll 10 = {1, 2}: df(a)=2, N=2 -> idf(a)=0
    coll 20 = {1, 3}: df(a)=1, N=2 -> idf(a)=ln 2
    """
    from tfidf_spark.operators.scoring import collection_scoped_tfidf

    assoc = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 20), (3, 20)], "doc_id bigint, coll_id bigint"
    )
    n_per = assoc.groupBy("coll_id").agg(F.count(F.lit(1)).alias("n_docs"))
    postings = build_postings(tiny_corpus)
    out = {
        (r["coll_id"], r["doc_id"], r["term"]): r["tfidf_r"]
        for r in collection_scoped_tfidf(postings, assoc, n_per, k=10).collect()
    }
    # doc 1: "a a b c", dl=4, tf(a)=0.5
    assert out[(10, 1, "a")] == pytest.approx(0.0)                 # df=2,N=2
    assert out[(20, 1, "a")] == pytest.approx(round(0.5 * math.log(2), 6))
    # term c in coll 20: docs 1 and 3 both have it -> idf 0 for both
    assert out[(20, 3, "c")] == pytest.approx(0.0)
    # doc 2 appears only under coll 10; doc 3 only under coll 20
    assert not any(c == 20 and d == 2 for c, d, _ in out)
    assert not any(c == 10 and d == 3 for c, d, _ in out)
