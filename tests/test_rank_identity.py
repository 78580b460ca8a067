"""End-to-end rank-identity: synthetic corpus -> BOTH engine paths
(pure-DataFrame scorer and compressed index) must match the pure-Python
reference-semantics oracle on the seeded reference query set
(SURVEY.md §5.2; FIXTURES.md §2): docID sequence exact, scores
approx rel=1e-9."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfidf_spark.index.builder import build_index, load_index
from tfidf_spark.index.query import bm25_query_index
from tfidf_spark.operators.postings import build_postings, term_df
from tfidf_spark.operators.scoring import bm25_topk
from tfidf_spark.oracle import OracleIndex
from tfidf_spark.sources.corpus import reference_queries, synth_corpus, with_doc_id

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_doc_id(synth_corpus(spark, N_DOCS, partitions=4)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.select("doc_id", "content").collect()
    return OracleIndex({r["doc_id"]: r["content"] for r in rows})


@pytest.fixture(scope="module")
def built_index(tmp_path_factory, corpus, spark):
    out = str(tmp_path_factory.mktemp("synthidx"))
    build_index(corpus, out, n_shards=4)
    return load_index(spark, out)


def test_corpus_is_deterministic_across_partitionings(spark):
    a = synth_corpus(spark, 50, partitions=1).collect()
    b = synth_corpus(spark, 50, partitions=7).collect()
    ka = sorted((r["repo"], r["path"], r["content"]) for r in a)
    kb = sorted((r["repo"], r["path"], r["content"]) for r in b)
    assert ka == kb


def test_corpus_stats_match_oracle(corpus, oracle):
    postings = build_postings(corpus)
    dfs = {r["term"]: r["df"] for r in term_df(postings).collect()}
    assert dfs == {t: d for t, d in oracle.df.items()}
    assert oracle.n_docs == N_DOCS
    # skew sanity: the corpus must actually have stop-like terms
    assert max(dfs.values()) > 0.8 * N_DOCS


QUERY_SET = reference_queries(30)


@pytest.mark.parametrize("qid,terms,k", QUERY_SET, ids=[f"q{q}" for q, _, _ in QUERY_SET])
def test_dataframe_scorer_rank_identity(corpus, oracle, qid, terms, k):
    postings = build_postings(corpus)
    got = bm25_topk(
        postings, term_df(postings), oracle.n_docs, oracle.avgdl, terms, k=k
    ).collect()
    expect = oracle.bm25_topk(terms, k)
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_index_path_rank_identity_batch(spark, built_index, oracle):
    """All 30 reference queries through the compressed index in ONE batch."""
    qdf = spark.createDataFrame(
        [(qid, terms, k) for qid, terms, k in QUERY_SET],
        "query_id long, terms array<string>, k int",
    )
    got = bm25_query_index(built_index, qdf).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
    for qid, terms, k in QUERY_SET:
        expect = oracle.bm25_topk(terms, k)
        got_q = by_q.get(qid, [])
        assert [r["doc_id"] for r in got_q] == [d for d, _ in expect], f"q{qid} {terms}"
        for r, (_, s) in zip(got_q, expect):
            assert r["score"] == pytest.approx(s, rel=1e-9), f"q{qid}"


def test_content_sha256_invariant(corpus):
    """Per-row invariant (BASELINE.json input_hint): sha2(content,256) of
    what the engine carries equals the source table's hash."""
    src = corpus.select("doc_id", F.sha2("content", 256).alias("h"))
    roundtrip = corpus.select("doc_id", "content").join(src, "doc_id")
    bad = roundtrip.filter(F.sha2("content", 256) != F.col("h")).count()
    assert bad == 0
